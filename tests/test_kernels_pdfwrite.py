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

from doctor_spark.kernels.pdf import extract_pdf_layout_text, parse_pdf
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
