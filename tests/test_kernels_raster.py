"""V2 PDF thumbnails (reference utils.py:164-218, views.py:196-240):
the from-scratch layout rasterizer + PNG codec vs ``pdftoppm
-singlefile -f <p> -scale-to <max> -png`` semantics."""

from __future__ import annotations

import numpy as np
import pytest

from doctor_spark.corpus import _build_image_pdf, _build_text_pdf, _rng
from doctor_spark.kernels.pdf import parse_pdf
from doctor_spark.kernels.pdfwriter import Line, PageSpec, build_pdf
from doctor_spark.kernels.png import decode_png
from doctor_spark.kernels.raster import (
    RasterError,
    pdf_thumbnail,
    pdf_thumbnails,
    rasterize_page,
)


class TestScaleToGeometry:
    def test_portrait_letter_default_350(self):
        data, _ = _build_text_pdf(3, _rng(3))
        arr = decode_png(pdf_thumbnail(data))
        # -scale-to 350: long side (792) -> 350, short side rounds
        assert arr.shape == (350, int(612 * 350 / 792 + 0.5))

    def test_landscape_swaps_axes(self):
        data = build_pdf([PageSpec(
            lines=[Line(row=1, col=1, text="wide page")], landscape=True,
        )])
        arr = decode_png(pdf_thumbnail(data, 200))
        assert arr.shape == (int(612 * 200 / 792 + 0.5), 200)

    def test_deterministic(self):
        data, _ = _build_text_pdf(5, _rng(5))
        assert pdf_thumbnail(data) == pdf_thumbnail(data)


class TestInkPlacement:
    def test_text_lines_land_at_scaled_positions(self):
        """Grid row r sits at top-based y = 72 + r*Y_DENSITY; the first
        authored line's ink must appear at that scaled canvas row."""
        from doctor_spark.kernels.pdf import Y_DENSITY

        data = build_pdf([PageSpec(lines=[Line(row=4, col=2, text="hello")])])
        arr = decode_png(pdf_thumbnail(data, 350))
        dark_rows = np.flatnonzero((arr < 128).any(axis=1))
        assert dark_rows.size
        expected = (72.0 + 4 * Y_DENSITY) * 350 / 792
        assert abs(dark_rows.mean() - expected) < 8

    def test_blank_page_is_blank(self):
        data = build_pdf([PageSpec()])
        arr = decode_png(pdf_thumbnail(data, 100))
        assert (arr == 255).all()

    def test_redaction_rect_paints_black(self):
        clean = build_pdf([PageSpec(lines=[Line(row=3, col=1, text="text")])])
        redacted = build_pdf([PageSpec(
            lines=[Line(row=3, col=1, text="text")],
            redactions=[(3, 1, 4)],
        )])
        a0 = decode_png(pdf_thumbnail(clean, 200))
        a1 = decode_png(pdf_thumbnail(redacted, 200))
        assert (a1 < 128).sum() > (a0 < 128).sum() * 2

    def test_scan_page_paints_placeholder_and_reports_it(self):
        """The synthetic scan's image stream is a word table, not pixels
        — the rasterizer must paint the placeholder gray AND count it
        (the honesty signal), never invent pixel content."""
        data, _ = _build_image_pdf(7, _rng(7))
        doc = parse_pdf(data, collect_images=True)
        canvas, placeholders = rasterize_page(doc.pages[0], 350 / 792.0)
        assert placeholders == 1
        assert (canvas == 128).any()


class TestTruePixelDecode:
    def test_v1_written_pdf_thumbnails_show_the_actual_raster(self):
        """images→PDF (V1) then thumbnail (V2): the Flate DeviceGray
        XObject decodes to its true pixels, nearest-neighbor resampled —
        a closed loop across both from-scratch writers."""
        from doctor_spark.kernels.pdfwrite import pdf_from_images

        src = (np.arange(40 * 60) % 256).astype(np.uint8).reshape(40, 60)
        arr = decode_png(pdf_thumbnail(pdf_from_images([src]), 120))
        # page is 60x40 px at resolution=100 -> 43.2x28.8 pt; scale-to
        # 120 on the long side doubles it
        assert arr.shape == (80, 120)
        assert arr[0, 0] == src[0, 0] and arr[40, 60] == src[20, 30]
        assert len(np.unique(arr)) > 100  # real pixels, not a gray block

    def test_rgb_imagery_luma_collapses(self):
        from doctor_spark.kernels.pdfwrite import pdf_from_images

        rgb = np.zeros((10, 10, 3), dtype=np.uint8)
        rgb[:, :, 0] = 255  # pure red -> floor(255/3) = 85 luma
        arr = decode_png(pdf_thumbnail(pdf_from_images([rgb]), 20))
        assert (arr == 85).any()


class TestRangePath:
    def test_one_png_per_requested_page(self):
        data, _ = _build_text_pdf(3, _rng(3))
        n = parse_pdf(data).page_count
        out = pdf_thumbnails(data, 150, [1, n, n + 7])
        assert sorted(out) == sorted({1, n})  # out-of-range skipped
        for png in out.values():
            assert decode_png(png).shape[0] == 150

    def test_page_selection_beyond_one(self):
        data, _ = _build_text_pdf(3, _rng(3))
        if parse_pdf(data).page_count >= 2:
            a = pdf_thumbnail(data, 150, page=1)
            b = pdf_thumbnail(data, 150, page=2)
            assert a != b


class TestFailClosed:
    def test_garbage(self):
        with pytest.raises(RasterError):
            pdf_thumbnail(b"not a pdf")

    def test_out_of_range_page(self):
        data, _ = _build_text_pdf(3, _rng(3))
        with pytest.raises(RasterError):
            pdf_thumbnail(data, page=99)


class TestOverlayInvisibility:
    def test_v4_overlay_does_not_change_the_v2_thumbnail(self):
        """pdftoppm does not render text in render mode 3 — an OCR
        overlay (V4) must leave the page-1 thumbnail byte-identical,
        while extraction still reads the embedded words.  Cross-checks
        the interpreter's new Tr tracking end-to-end."""
        from doctor_spark.kernels.pdf import (
            extract_pdf_layout_text,
            synthetic_ocr_backend,
        )
        from doctor_spark.kernels.pdfwrite import embed_text_overlay

        data, _ = _build_image_pdf(7, _rng(7))
        words = synthetic_ocr_backend(
            parse_pdf(data).pages[0], False
        )
        out = embed_text_overlay(data, [words], 1700, 2200)
        assert pdf_thumbnail(out, 200) == pdf_thumbnail(data, 200)
        assert extract_pdf_layout_text(out)[0].strip() != ""

    def test_visible_text_still_rasterizes(self):
        data = build_pdf([PageSpec(lines=[Line(row=3, col=1, text="ink")])])
        arr = decode_png(pdf_thumbnail(data, 150))
        assert (arr < 128).any()
