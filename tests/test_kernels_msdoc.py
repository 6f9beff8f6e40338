"""From-scratch .doc (OLE2 + Word FIB) kernel: round trips + fail-closed."""

from doctor_spark.kernels.extract import extract_document
from doctor_spark.kernels.msdoc import build_doc, extract_from_doc_bytes


class TestDocRoundTrip:
    def test_simple(self):
        text = "NOTICE OF MOTION\nThe parties are advised\nas follows"
        content, err, rc = extract_from_doc_bytes(build_doc(text))
        assert (content, err, rc) == (text, "", 0)

    def test_long_document_multi_sector(self):
        text = "\n".join(f"paragraph {i} " + "word " * 40 for i in range(60))
        content, err, rc = extract_from_doc_bytes(build_doc(text))
        assert rc == 0 and content == text

    def test_dispatch_route(self):
        res = extract_document("https://a.test/memo.doc", build_doc("memo body"))
        assert (res.content, res.extension, res.err) == ("memo body", "doc", "")

    def test_junk_after_magic_fails_closed(self):
        import random
        r = random.Random(7)
        junk = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + bytes(
            r.getrandbits(8) for _ in range(2048)
        )
        content, err, rc = extract_from_doc_bytes(junk)
        assert content == "" and rc == 1

    def test_truncated(self):
        assert extract_from_doc_bytes(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1")[2] == 1

    def test_docx_zip_rejected(self):
        assert extract_from_doc_bytes(b"PK\x03\x04 not ole")[2] == 1
