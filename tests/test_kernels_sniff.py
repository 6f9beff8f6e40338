"""Mime/extension sniffing goldens, mirroring the reference's extension
workaround tests (doctor/tests.py:301-378, views.py:297-349)."""

import zlib

from doctor_spark.kernels.sniff import (
    classify,
    extension_from_url,
    sniff_extension,
    sniff_mime,
)


def _fake_pdf(body=b"hello"):
    return b"%PDF-1.4\n1 0 obj\n<< >>\nendobj\n" + body + b"\n%%EOF"


class TestSniffMime:
    def test_pdf(self):
        assert sniff_mime(_fake_pdf()) == "application/pdf"

    def test_ole_doc(self):
        assert sniff_mime(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\x00" * 100) == "application/msword"

    def test_docx_zip(self):
        payload = b"PK\x03\x04" + b"\x00" * 20 + b"[Content_Types].xml word/document.xml"
        assert sniff_mime(payload).endswith("wordprocessingml.document")

    def test_wordperfect(self):
        assert sniff_mime(b"\xffWPCdocument") == "application/vnd.wordperfect"

    def test_html_doctype(self):
        assert sniff_mime(b"  <!DOCTYPE html><html><body>x</body></html>") == "text/html"

    def test_html_after_bom(self):
        assert sniff_mime(b"\xef\xbb\xbf<html><p>x</p></html>") == "text/html"

    def test_plain_text(self):
        assert sniff_mime(b"Just some plain words.\nAnother line.\n") == "text/plain"

    def test_mp3_id3(self):
        assert sniff_mime(b"ID3\x04\x00" + b"\x00" * 64) == "audio/mpeg"

    def test_binary_junk(self):
        assert sniff_mime(zlib.compress(b"x" * 512)) == "application/octet-stream"


class TestSniffExtension:
    def test_pdf_rescue_in_first_40(self):
        # broken-magic pdf: no %PDF at offset 0 but 'PDF' early
        # (reference views.py:326-332 .obj workaround)
        payload = b"\x01\x02 PDF junkjunk" + b"\x00" * 100
        assert sniff_extension(payload) == ".pdf"

    def test_pdf_version_rescue_in_1024(self):
        # reference views.py:333-339 .bin workaround — %PDF-1.6 at offset > 40
        payload = b"\x00\x01\x02\x03" * 15 + b"%PDF-1.6 stream" + b"\x00" * 64
        assert sniff_extension(payload) == ".pdf"

    def test_fixes_table(self):
        # .dot→.doc via the OLE magic, lowercased
        assert sniff_extension(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\x00" * 8) == ".doc"

    def test_plain_bin(self):
        assert sniff_extension(bytes(range(256)) * 4) == ".bin"


class TestExtensionFromUrl:
    def test_simple(self):
        assert extension_from_url("https://a.test/docs/opinion.PDF") == "pdf"

    def test_fixes_htm(self):
        assert extension_from_url("https://a.test/page.htm") == "html"

    def test_query_string_ignored(self):
        assert extension_from_url("https://a.test/f.txt?dl=1#frag") == "txt"

    def test_no_extension(self):
        assert extension_from_url("https://a.test/path/") == ""


class TestClassify:
    def test_url_wins_when_known(self):
        mime, ext = classify("https://a.test/x.html", b"%PDF-1.4 ...")
        assert ext == "html"  # filename routes, like the reference's form
        assert mime == "application/pdf"  # but the sniffed mime is honest

    def test_content_rescues_unknown_suffix(self):
        mime, ext = classify("https://a.test/download?id=9", _fake_pdf())
        assert (mime, ext) == ("application/pdf", "pdf")
