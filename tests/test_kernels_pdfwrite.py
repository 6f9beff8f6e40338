"""PDF writing kernels (V1 images→PDF, V3 metadata strip).

Reference semantics: doctor/tasks.py:39-53 (strip_metadata_from_bytes —
pypdf rebuild + {"/CreationDate": "", "/ModDate": ""}; purpose is PDF
hashing, so determinism is the contract) and tasks.py:55-72
(pdf_bytes_from_images — PIL multi-page PDF at resolution=100)."""

from __future__ import annotations

import re
from pathlib import Path

import numpy as np
import pytest

from doctor_spark.kernels.pdf import (
    PdfParseError,
    extract_pdf_layout_text,
    parse_pdf,
)
from doctor_spark.kernels.pdfwrite import (
    PdfWriteError,
    pdf_from_images,
    pdf_from_png_bytes,
    strip_pdf_metadata,
)
from doctor_spark.kernels.png import encode_png

ASSETS = Path("/root/reference/doctor/test_assets")
needs_assets = pytest.mark.skipif(
    not ASSETS.is_dir(), reason="reference checkout not present"
)


class TestPdfFromImages:
    def test_two_pages_rgb_and_gray(self):
        rgb = (np.arange(40 * 60 * 3) % 256).astype(np.uint8).reshape(40, 60, 3)
        gray = (np.arange(30 * 30) % 256).astype(np.uint8).reshape(30, 30)
        doc = parse_pdf(pdf_from_images([rgb, gray]))
        assert doc.page_count == 2
        assert [len(p.images) for p in doc.pages] == [1, 1]
        # PIL semantics: page points = pixels * 72 / resolution(=100)
        assert (doc.pages[0].width, doc.pages[0].height) == (43.2, 28.8)
        assert (doc.pages[1].width, doc.pages[1].height) == (21.6, 21.6)
        assert doc.pages[0].images[0].width == 60.0

    def test_png_path_uses_codec_and_drops_alpha(self):
        rgba = np.zeros((8, 8, 4), dtype=np.uint8)
        rgba[:, :, 3] = 255
        pdf = pdf_from_png_bytes([encode_png(rgba)])
        doc = parse_pdf(pdf)
        assert doc.page_count == 1
        assert doc.pages[0].images[0].width == 8.0

    def test_deterministic_and_empty_rejected(self):
        img = np.full((5, 5), 7, dtype=np.uint8)
        assert pdf_from_images([img]) == pdf_from_images([img])
        with pytest.raises(PdfWriteError):
            pdf_from_images([])

    def test_pages_have_no_text_and_gate_ocr(self):
        img = np.full((50, 50), 200, dtype=np.uint8)
        content, err, rc = extract_pdf_layout_text(pdf_from_images([img]))
        assert rc == 0 and content.strip("\f\n ") == ""


class TestStripMetadata:
    @needs_assets
    def test_roundtrip_text_identical_vector_pdf(self):
        # vector-pdf: 30 pages, ObjStm members promoted, XMP dropped
        data = (ASSETS / "vector-pdf.pdf").read_bytes()
        out = strip_pdf_metadata(data)
        assert extract_pdf_layout_text(out)[0] == extract_pdf_layout_text(data)[0]
        assert parse_pdf(out).page_count == parse_pdf(data).page_count
        assert b"xmp:CreateDate" not in out

    @needs_assets
    def test_deterministic(self):
        data = (ASSETS / "vector-pdf.pdf").read_bytes()
        assert strip_pdf_metadata(data) == strip_pdf_metadata(data)

    @needs_assets
    def test_metadata_only_difference_hashes_equal(self):
        """The reference's stated purpose: hash PDFs ignoring metadata.
        Two inputs differing only in an XMP date must serialize
        byte-identically."""
        data = (ASSETS / "vector-pdf.pdf").read_bytes()
        m = re.search(rb"xmp:CreateDate>([^<]+)<", data)
        assert m, "fixture lost its XMP date"
        date = m.group(1)
        patched = (
            data[: m.start(1)]
            + re.sub(rb"\d", b"7", date)
            + data[m.end(1):]
        )
        assert patched != data and len(patched) == len(data)
        assert strip_pdf_metadata(patched) == strip_pdf_metadata(data)

    @needs_assets
    def test_other_fixture_roundtrip(self):
        data = (ASSETS / "missouri.pdf").read_bytes()
        out = strip_pdf_metadata(data)
        assert extract_pdf_layout_text(out)[0] == extract_pdf_layout_text(data)[0]

    def test_garbage_fails_closed(self):
        with pytest.raises((PdfWriteError, ValueError, Exception)):
            strip_pdf_metadata(b"not a pdf at all")


class TestEmbedTextOverlay:
    """V4 "embed text" (reference views.py:439-474 + utils.py:317-356):
    invisible OCR text layer merged into an existing PDF.  The closed
    loop this sandbox CAN verify: the overlay written by this kernel is
    re-extracted by this repo's independent parser (matching pdftotext,
    which reads invisible text — the point of an OCR layer)."""

    RASTER = (1700, 2200)  # the synthetic corpus' scan dimensions

    @staticmethod
    def _image_doc(doc_id: int):
        from doctor_spark.corpus import _build_image_pdf, _rng
        from doctor_spark.kernels.pdf import synthetic_ocr_backend

        data, golden = _build_image_pdf(doc_id, _rng(doc_id))
        words = synthetic_ocr_backend(parse_pdf(data).pages[0], False)
        return data, golden, words

    def test_roundtrip_tokens_exact(self):
        from doctor_spark.kernels.pdfwrite import embed_text_overlay

        data, _, words = self._image_doc(3)  # 4 lines, 19 words
        assert len({w["line_num"] for w in words}) >= 3
        out = embed_text_overlay(data, [words], *self.RASTER)
        content, err, rc = extract_pdf_layout_text(out)
        assert rc == 0 and not err
        # reading order (top, then x) must survive the coordinate math
        assert re.split(r"\s+", content.strip()) == [w["text"] for w in words]
        # the source page was image-only: its own layout text was empty
        assert extract_pdf_layout_text(data)[0].strip("\f\n ") == ""

    def test_overlay_is_invisible_by_both_mechanisms(self):
        from doctor_spark.kernels.pdfwrite import embed_text_overlay

        data, _, words = self._image_doc(7)
        out = embed_text_overlay(data, [words], *self.RASTER)
        assert b"3 Tr" in out          # text render mode 3 (ISO 32000-1)
        assert b"/ca 0" in out         # reportlab setFillAlpha(0) analog
        assert b"/GSdsocr" in out and b"/Fdsocr" in out

    def test_reference_coordinate_math(self):
        """utils.py:336-346 verbatim: x=(8.5*72/w)*left,
        yy=(11*72)-(11*72/h)*top, baseline=yy-(11*72/h)*height."""
        from doctor_spark.kernels.pdfwrite import embed_text_overlay

        data, _, _ = self._image_doc(1)
        w = [{"text": "X", "left": 850, "top": 1100, "width": 30,
              "height": 44, "line_num": 1, "par_num": 1, "block_num": 1}]
        out = embed_text_overlay(data, [w], 1700, 2200)
        x = (8.5 * 72 / 1700) * 850            # 306
        y = (11 * 72) - (11 * 72 / 2200) * 1100 - (11 * 72 / 2200) * 44
        frag = b"1 0 0 1 %s %s Tm (X) Tj" % (
            str(int(x)).encode(), (f"{y:.6f}").rstrip("0").rstrip(".").encode()
        )
        assert frag in out, (frag, out[-400:])

    def test_multipage_untouched_pages_byte_stable(self):
        from doctor_spark.corpus import _build_text_pdf, _rng
        from doctor_spark.kernels.pdfwrite import embed_text_overlay

        data, _ = _build_text_pdf(3, _rng(3))
        n = parse_pdf(data).page_count
        assert n >= 2
        fake = [{"text": "OVERLAYWORD", "left": 100, "top": 100,
                 "width": 300, "height": 40}]
        tables = [None] * n
        tables[1] = fake
        out = embed_text_overlay(data, tables, 1700, 2200)
        p0 = extract_pdf_layout_text(data)[0].split("\f")
        p1 = extract_pdf_layout_text(out)[0].split("\f")
        assert len(p0) == len(p1)
        assert p1[0] == p0[0]                      # untouched page exact
        assert "OVERLAYWORD" in p1[1]              # overlay present
        for line in p0[1].split("\n"):             # original text kept
            if line.strip():
                assert line.strip() in p1[1]

    def test_deterministic(self):
        from doctor_spark.kernels.pdfwrite import embed_text_overlay

        data, _, words = self._image_doc(11)
        a = embed_text_overlay(data, [words], *self.RASTER)
        assert a == embed_text_overlay(data, [words], *self.RASTER)

    def test_real_tesseract_tsv_words_roundtrip(self):
        """The recorded pytesseract TSV (tests/fixtures/
        recap_scan_page1.tsv) drives the overlay exactly as the reference
        feeds image_to_data output to make_page_with_text — including
        structural conf=-1 rows (empty text, skipped) and low-confidence
        words (the reference applies NO conf filter here)."""
        import csv

        from doctor_spark.kernels.pdfwrite import embed_text_overlay

        path = Path(__file__).parent / "fixtures" / "recap_scan_page1.tsv"
        rows = list(csv.DictReader(open(path), delimiter="\t"))
        words = [
            {"text": r["text"], "left": int(r["left"]), "top": int(r["top"]),
             "width": int(r["width"]), "height": int(r["height"])}
            for r in rows if r["text"].strip()
        ]
        data, _, _ = self._image_doc(2)
        out = embed_text_overlay(data, [words], 2550, 3300)
        content = extract_pdf_layout_text(out)[0]
        missing = [w["text"] for w in words
                   if w["text"] not in content]
        assert not missing, missing[:5]

    def test_garbage_fails_closed(self):
        from doctor_spark.kernels.pdfwrite import embed_text_overlay

        with pytest.raises((PdfWriteError, PdfParseError, Exception)):
            embed_text_overlay(b"junk", [[]], 100, 100)
