"""Round-trip goldens for the from-scratch PDF reader: fixtures authored by
our own writer (kernels/pdfwriter.py), expected text byte-identical by
construction.  Fixture classes mirror the reference test-asset inventory
(FIXTURES.md §3, doctor/tests.py:114-190, 416-465)."""

from doctor_spark.kernels.extract import (
    extract_document,
    extract_from_pdf_bytes,
    extract_recap_pdf_bytes,
)
from doctor_spark.kernels.pdf import (
    get_document_number,
    get_page_count,
    layout_page_text,
    ocr_needed,
    page_needs_ocr,
    parse_pdf,
    pdf_has_images,
)
from doctor_spark.kernels.pdfwriter import (
    Line,
    PageSpec,
    build_pdf,
    text_to_lines,
)


def _layout_doc() -> bytes:
    page1 = PageSpec(
        lines=text_to_lines(
            "IN THE SUPREME COURT\n"
            "\n"
            "    Plaintiff alleges breach\n"
            "        of contract terms\n"
            "Footnote text here"
        )
    )
    page2 = PageSpec(lines=[Line(row=0, col=0, text="Second page content")])
    return build_pdf([page1, page2])


class TestLayoutRoundTrip:
    def test_text_grid_roundtrip(self):
        doc = parse_pdf(_layout_doc())
        assert doc.page_count == 2
        expected_p1 = (
            "IN THE SUPREME COURT\n"
            "\n"
            "    Plaintiff alleges breach\n"
            "        of contract terms\n"
            "Footnote text here"
        )
        assert layout_page_text(doc.pages[0]) == expected_p1
        assert layout_page_text(doc.pages[1]) == "Second page content"

    def test_two_column_layout(self):
        # two runs on one row, columns 0 and 40
        page = PageSpec(
            lines=[
                Line(row=0, col=0, text="left column"),
                Line(row=0, col=40, text="right column"),
            ]
        )
        doc = parse_pdf(build_pdf([page]))
        expected = "left column" + " " * (40 - len("left column")) + "right column"
        assert layout_page_text(doc.pages[0]) == expected

    def test_td_and_tj_and_quote_operators(self):
        page = PageSpec(
            lines=[
                Line(row=0, col=0, text="via Td op", op_style="Td"),
                Line(row=1, col=0, text="gap here via TJ", op_style="TJ"),
                Line(row=2, col=0, text="via quote op", op_style="quote"),
            ]
        )
        doc = parse_pdf(build_pdf([page]))
        assert layout_page_text(doc.pages[0]) == (
            "via Td op\ngap here via TJ\nvia quote op"
        )

    def test_uncompressed_streams(self):
        page = PageSpec(lines=[Line(row=0, col=0, text="plain stream")])
        doc = parse_pdf(build_pdf([page], compress=False))
        assert layout_page_text(doc.pages[0]) == "plain stream"

    def test_skewed_text_dropped_only_with_strip_margin(self):
        page = PageSpec(
            lines=[
                Line(row=2, col=0, text="normal text line"),
                Line(row=3, col=10, text="STAMP", skew=True),
            ]
        )
        raw = build_pdf([page])
        # plain flow keeps the skewed stamp
        content, _, _, _ = extract_from_pdf_bytes(raw)
        assert "STAMP" in content
        # recap strip_margin flow drops it
        content, by_ocr, _ = extract_recap_pdf_bytes(raw, strip_margin=True)
        assert "STAMP" not in content
        assert "normal text line" in content
        assert by_ocr is False

    def test_strip_margin_crops_header_and_footer(self):
        page = PageSpec(
            lines=[
                Line(row=0, col=0, text="in-band text", y_override=792 - 200),
                Line(row=0, col=0, text="TOP EDGE", y_override=792 - 30),
                Line(row=0, col=0, text="BOTTOM EDGE", y_override=20),
            ]
        )
        raw = build_pdf([page])
        content, _, _ = extract_recap_pdf_bytes(raw, strip_margin=True)
        assert content == "in-band text"


class TestPageCount:
    def test_count(self):
        assert get_page_count(_layout_doc(), "pdf") == 2

    def test_non_pdf_none(self):
        assert get_page_count(b"hello", "txt") is None

    def test_corrupt_pdf_zero(self):
        assert get_page_count(b"%PDF-1.4 garbage with no objects", "pdf") == 0


class TestOcrGates:
    def test_image_only_page_triggers_ocr(self):
        words = [
            {"text": "Scanned", "conf": 93, "left": 300, "top": 100,
             "width": 200, "height": 40, "line_num": 1, "par_num": 1,
             "block_num": 1},
            {"text": "text", "conf": 91, "left": 525, "top": 100,
             "width": 100, "height": 40, "line_num": 1, "par_num": 1,
             "block_num": 1},
        ]
        page = PageSpec(lines=[], image=(1700, 2200), ocr_words=words)
        raw = build_pdf([page])
        assert pdf_has_images(raw)
        assert ocr_needed(raw, "")
        content, err, rc, by_ocr = extract_from_pdf_bytes(raw, ocr_available=True)
        assert by_ocr is True
        assert content == "Scanned text"

    def test_recap_ocr_page(self):
        words = [
            {"text": "OCRWORD", "conf": 95, "left": 500, "top": 120,
             "width": 175, "height": 40, "line_num": 1, "par_num": 1,
             "block_num": 1},
        ]
        page = PageSpec(lines=[], image=(1700, 2200), ocr_words=words)
        content, by_ocr, ocr_pages = extract_recap_pdf_bytes(build_pdf([page]))
        assert by_ocr is True and ocr_pages == [1]
        assert "OCRWORD" in content

    def test_cid_garbage_triggers_page_ocr(self):
        page = PageSpec(lines=[Line(row=0, col=0, text="(cid:12)(cid:40)")])
        doc = parse_pdf(build_pdf([page]))
        text = layout_page_text(doc.pages[0])
        assert page_needs_ocr(doc.pages[0], text)

    def test_annotations_trigger_ocr(self):
        page = PageSpec(lines=[Line(row=0, col=0, text="some text")],
                        annots=["FreeText"])
        doc = parse_pdf(build_pdf([page]))
        assert page_needs_ocr(doc.pages[0], "some text")

    def test_curves_trigger_ocr(self):
        page = PageSpec(lines=[Line(row=0, col=0, text="t")], curves=11)
        doc = parse_pdf(build_pdf([page]))
        assert doc.pages[0].curve_count == 11
        assert page_needs_ocr(doc.pages[0], "t")

    def test_text_page_no_ocr(self):
        page = PageSpec(lines=[Line(row=0, col=0, text="clean text page")])
        doc = parse_pdf(build_pdf([page]))
        assert not page_needs_ocr(doc.pages[0], "clean text page")


class TestOcrTakeLonger:
    def test_short_ocr_not_taken(self):
        # text layer longer than the OCR table -> keep text layer
        words = [{"text": "x", "conf": 90, "left": 300, "top": 100,
                  "width": 20, "height": 30, "line_num": 1, "par_num": 1,
                  "block_num": 1}]
        page = PageSpec(
            lines=text_to_lines("a long extracted text layer wins here"),
            image=(20, 20), ocr_words=words,
        )
        content, _, _, by_ocr = extract_from_pdf_bytes(
            build_pdf([page]), ocr_available=True
        )
        assert by_ocr is False
        # pdftotext-style output: form feed terminates every page
        assert content == "a long extracted text layer wins here\f"


class TestMojibake:
    def test_mojibake_fixed_without_ocr(self):
        # '¬¸·- ·- ³±¶·¾¿µ»' decodes to 'this is mojibake' (µ = micro sign,
        # the cp1252-encodable byte 0xB5)
        page = PageSpec(lines=[Line(row=0, col=0, text="¬¸·- ·- ³±¶·¾¿µ»")])
        content, _, _, _ = extract_from_pdf_bytes(build_pdf([page]))
        assert content.startswith("this is mojibake")

    def test_normal_text_not_remapped(self):
        page = PageSpec(lines=[Line(row=0, col=0, text="the regular text")])
        content, _, _, _ = extract_from_pdf_bytes(build_pdf([page]))
        assert content.startswith("the regular text")


class TestDocumentNumber:
    def test_header_stamp_number(self):
        page = PageSpec(
            lines=[
                Line(row=0, col=0, text="Case: 21-55555 Document: 1-1 Page: 1",
                     header_stamp=True),
                Line(row=2, col=0, text="body text"),
            ]
        )
        assert get_document_number(build_pdf([page])) == "1-1"

    def test_dktentry(self):
        page = PageSpec(
            lines=[Line(row=0, col=0, text="Case 9-88, DktEntry: 7-2",
                        header_stamp=True)]
        )
        assert get_document_number(build_pdf([page])) == "7-2"

    def test_no_stamp(self):
        page = PageSpec(lines=[Line(row=2, col=0, text="no stamp here")])
        assert get_document_number(build_pdf([page])) == ""


class TestBrokenMagic:
    def test_broken_magic_dispatch(self):
        page = PageSpec(lines=[Line(row=0, col=0, text="rescued pdf body")])
        raw = build_pdf([page], broken_magic=True)
        res = extract_document("https://a.test/download/broken.bin", raw)
        assert res.extension == "pdf"
        assert res.content.startswith("rescued pdf body")
        assert res.page_count == 1


class TestExtractDocumentDispatch:
    def test_html(self):
        res = extract_document(
            "https://a.test/p.html", b"<body><p>hi there</p></body>"
        )
        assert (res.content, res.extension, res.page_count) == (
            "<p>hi there</p>", "html", None
        )

    def test_txt(self):
        res = extract_document("https://a.test/f.txt", b"plain body")
        assert (res.content, res.extension) == ("plain body", "txt")

    def test_docx(self):
        from doctor_spark.kernels.docx import build_docx

        raw = build_docx(["First paragraph", "Second one"])
        res = extract_document("https://a.test/d.docx", raw)
        assert res.content == "\nFirst paragraph\nSecond one"
        assert res.extension == "docx"

    def test_unknown_junk(self):
        res = extract_document("https://a.test/blob", bytes(range(256)) * 4)
        assert res.err != "" and res.content == ""

    def test_poison_never_raises(self):
        res = extract_document("https://a.test/x.pdf", b"%PDF-1.4\xff\xfe\x00trunc")
        assert res.err == "" or isinstance(res.err, str)  # no exception
        assert res.content == ""


class TestXray:
    def test_redaction_with_recoverable_text(self):
        page = PageSpec(
            lines=[
                Line(row=0, col=0, text="public heading"),
                Line(row=2, col=4, text="SECRET NAME"),
                Line(row=4, col=0, text="public footer"),
            ],
            redactions=[(2, 4, 11)],
        )
        from doctor_spark.kernels.pdf import get_xray

        xr = get_xray(build_pdf([page]))
        assert xr["error"] is False
        assert list(xr["results"].keys()) == [1]
        hit = xr["results"][1][0]
        assert hit["text"] == "SECRET NAME"
        assert len(hit["bbox"]) == 4

    def test_clean_page_no_hits(self):
        from doctor_spark.kernels.pdf import get_xray

        page = PageSpec(lines=[Line(row=0, col=0, text="nothing hidden")])
        xr = get_xray(build_pdf([page]))
        assert xr == {"error": False, "results": {}}

    def test_corrupt_pdf_error_flag(self):
        from doctor_spark.kernels.pdf import get_xray

        assert get_xray(b"not a pdf at all")["error"] is True


class TestLandscapePages:
    def test_strip_margin_skips_landscape(self):
        # reference get_page_text: crop+skew-filter branch only when
        # height > width (text_extraction.py:45-53); landscape pages keep
        # margins AND skewed text even with strip_margin=True
        page = PageSpec(
            lines=[
                Line(row=0, col=0, text="landscape body"),
                Line(row=1, col=10, text="SKEWSTAMP", skew=True),
            ],
            landscape=True,
        )
        raw = build_pdf([page])
        content, by_ocr, _ = extract_recap_pdf_bytes(raw, strip_margin=True)
        assert "landscape body" in content
        assert "SKEWSTAMP" in content  # skew filter not applied
        assert by_ocr is False


class TestEncryptedPdf:
    """Standard-security-handler (RC4, empty user password) round trip +
    fail-closed behavior for unsupported schemes."""

    @staticmethod
    def _build(r=3, text=b"Secret content here", break_u=False, v=None):
        import hashlib
        import struct

        from doctor_spark.kernels.pdf import _PW_PAD, _object_key, _rc4

        n = 16 if r >= 3 else 5
        v = v if v is not None else (2 if r >= 3 else 1)
        p = -44
        id0 = bytes(range(16))

        okey = hashlib.md5(_PW_PAD).digest()
        if r >= 3:
            for _ in range(50):
                okey = hashlib.md5(okey[:n]).digest()
        okey = okey[:n]
        x = _PW_PAD
        x = _rc4(okey, x)
        if r >= 3:
            for i in range(1, 20):
                x = _rc4(bytes(b ^ i for b in okey), x)
        o_entry = x

        key = hashlib.md5(
            _PW_PAD + o_entry[:32] + struct.pack("<i", p) + id0
        ).digest()
        if r >= 3:
            for _ in range(50):
                key = hashlib.md5(key[:n]).digest()
        key = key[:n]

        if r == 2:
            u_entry = _rc4(key, _PW_PAD)
        else:
            u = hashlib.md5(_PW_PAD + id0).digest()
            u = _rc4(key, u)
            for i in range(1, 20):
                u = _rc4(bytes(b ^ i for b in key), u)
            u_entry = u + b"\x00" * 16
        if break_u:
            u_entry = bytes(32)

        content = b"BT /F1 12 Tf 72 720 Td <" + text.hex().encode() + b"> Tj ET"
        enc_content = _rc4(_object_key(key, 4, 0), content)

        objs = {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            3: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
               b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
            4: b"<< /Length " + str(len(enc_content)).encode() + b" >>\n"
               b"stream\n" + enc_content + b"\nendstream",
            5: b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>",
            6: b"<< /Filter /Standard /V " + str(v).encode() + b" /R "
               + str(r).encode() + b" /Length " + str(n * 8).encode()
               + b" /P " + str(p).encode()
               + b" /O <" + o_entry.hex().encode() + b">"
               + b" /U <" + u_entry.hex().encode() + b"> >>",
        }
        body = b"%PDF-1.4\n"
        for num, payload in objs.items():
            body += f"{num} 0 obj\n".encode() + payload + b"\nendobj\n"
        body += (
            b"trailer\n<< /Size 7 /Root 1 0 R /Encrypt 6 0 R /ID [<"
            + id0.hex().encode() + b"> <" + id0.hex().encode() + b">] >>\n"
            b"%%EOF\n"
        )
        return body

    @staticmethod
    def _wrap_doc(enc_content: bytes, enc_dict: bytes, id0: bytes) -> bytes:
        objs = {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            3: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
               b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
            4: b"<< /Length " + str(len(enc_content)).encode() + b" >>\n"
               b"stream\n" + enc_content + b"\nendstream",
            5: b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>",
            6: enc_dict,
        }
        body = b"%PDF-1.6\n"
        for num, payload in objs.items():
            body += f"{num} 0 obj\n".encode() + payload + b"\nendobj\n"
        body += (
            b"trailer\n<< /Size 7 /Root 1 0 R /Encrypt 6 0 R /ID [<"
            + id0.hex().encode() + b"> <" + id0.hex().encode() + b">] >>\n"
            b"%%EOF\n"
        )
        return body

    @classmethod
    def _build_aesv2(cls, text=b"Secret content here"):
        """V4/R4 with the AESV2 crypt filter (AES-128-CBC, sAlT object
        keys), empty user password."""
        import hashlib
        import struct

        from doctor_spark.kernels.aes import pdf_aes_encrypt_stream
        from doctor_spark.kernels.pdf import _PW_PAD, _object_key, _rc4

        n, p, id0 = 16, -44, bytes(range(16))
        okey = hashlib.md5(_PW_PAD).digest()
        for _ in range(50):
            okey = hashlib.md5(okey[:n]).digest()
        okey = okey[:n]
        x = _rc4(okey, _PW_PAD)
        for i in range(1, 20):
            x = _rc4(bytes(b ^ i for b in okey), x)
        o_entry = x
        key = hashlib.md5(
            _PW_PAD + o_entry[:32] + struct.pack("<i", p) + id0
        ).digest()
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()
        key = key[:n]
        u = hashlib.md5(_PW_PAD + id0).digest()
        u = _rc4(key, u)
        for i in range(1, 20):
            u = _rc4(bytes(b ^ i for b in key), u)
        u_entry = u + b"\x00" * 16

        content = b"BT /F1 12 Tf 72 720 Td <" + text.hex().encode() + b"> Tj ET"
        obj_key = _object_key(key, 4, 0, aes=True)
        enc_content = pdf_aes_encrypt_stream(obj_key, bytes(range(16)), content)
        enc_dict = (
            b"<< /Filter /Standard /V 4 /R 4 /Length 128"
            b" /CF << /StdCF << /CFM /AESV2 /Length 16 >> >>"
            b" /StmF /StdCF /StrF /StdCF"
            b" /P " + str(p).encode()
            + b" /O <" + o_entry.hex().encode() + b">"
            + b" /U <" + u_entry.hex().encode() + b"> >>"
        )
        return cls._wrap_doc(enc_content, enc_dict, id0)

    @classmethod
    def _build_aesv3(cls, r=6, text=b"Secret content here", break_u=False):
        """V5 (AESV3, AES-256-CBC) with empty user password; R6 uses the
        ISO 32000-2 algorithm-2.B hash, R5 the deprecated plain SHA-256."""
        import hashlib

        from doctor_spark.kernels.aes import (
            cbc_encrypt,
            hash_2b,
            pdf_aes_encrypt_stream,
        )

        id0 = bytes(range(16))
        file_key = bytes(range(32, 64))
        vsalt, ksalt = b"01234567", b"89abcdef"
        if r == 6:
            h = hash_2b(b"", vsalt)
            inter = hash_2b(b"", ksalt)
        else:
            h = hashlib.sha256(vsalt).digest()
            inter = hashlib.sha256(ksalt).digest()
        if break_u:
            h = bytes(32)
        u_entry = h + vsalt + ksalt
        ue = cbc_encrypt(inter, b"\x00" * 16, file_key, pad=False)
        content = b"BT /F1 12 Tf 72 720 Td <" + text.hex().encode() + b"> Tj ET"
        enc_content = pdf_aes_encrypt_stream(file_key, bytes(range(16)), content)
        enc_dict = (
            b"<< /Filter /Standard /V 5 /R " + str(r).encode()
            + b" /Length 256"
            b" /CF << /StdCF << /CFM /AESV3 /Length 32 >> >>"
            b" /StmF /StdCF /StrF /StdCF /P -44"
            b" /O <" + (b"\x11" * 48).hex().encode() + b">"
            + b" /OE <" + (b"\x22" * 32).hex().encode() + b">"
            + b" /U <" + u_entry.hex().encode() + b">"
            + b" /UE <" + ue.hex().encode() + b"> >>"
        )
        return cls._wrap_doc(enc_content, enc_dict, id0)

    def test_aesv2_roundtrip(self):
        from doctor_spark.kernels.pdf import extract_pdf_layout_text

        content, err, rc = extract_pdf_layout_text(self._build_aesv2())
        assert err == "" and "Secret content here" in content

    def test_aesv3_r6_roundtrip(self):
        from doctor_spark.kernels.pdf import extract_pdf_layout_text

        content, err, rc = extract_pdf_layout_text(self._build_aesv3(r=6))
        assert err == "" and "Secret content here" in content

    def test_aesv3_r5_roundtrip(self):
        from doctor_spark.kernels.pdf import extract_pdf_layout_text

        content, err, rc = extract_pdf_layout_text(self._build_aesv3(r=5))
        assert err == "" and "Secret content here" in content

    def test_aesv3_wrong_password_fails_closed(self):
        from doctor_spark.kernels.pdf import extract_pdf_layout_text

        content, err, rc = extract_pdf_layout_text(
            self._build_aesv3(r=6, break_u=True)
        )
        assert content == "" and "password" in err

    def test_rc4_r3_roundtrip(self):
        from doctor_spark.kernels.pdf import extract_pdf_layout_text

        content, err, rc = extract_pdf_layout_text(self._build(r=3))
        assert err == "" and "Secret content here" in content

    def test_rc4_r2_roundtrip(self):
        from doctor_spark.kernels.pdf import extract_pdf_layout_text

        content, err, rc = extract_pdf_layout_text(self._build(r=2))
        assert err == "" and "Secret content here" in content

    def test_password_protected_fails_closed(self):
        from doctor_spark.kernels.pdf import extract_pdf_layout_text

        content, err, rc = extract_pdf_layout_text(self._build(break_u=True))
        assert content == "" and "password" in err

    def test_unsupported_scheme_fails_closed(self):
        from doctor_spark.kernels.pdf import extract_pdf_layout_text

        content, err, rc = extract_pdf_layout_text(self._build(v=7))
        assert content == "" and "encryption" in err
        # V5 marker without valid U/UE entries: still an err row, never
        # garbage (the RC4-era _build writes no /UE)
        content, err, rc = extract_pdf_layout_text(self._build(v=5))
        assert content == "" and rc != 0

    def test_page_count_survives_encryption(self):
        from doctor_spark.kernels.pdf import get_page_count

        assert get_page_count(self._build(v=5), "pdf") == 1

    def test_damaged_trailer_on_encrypted_file_fails_closed(self):
        """/Encrypt present but the trailer made unparseable: the
        still-encrypted streams must NOT be interpreted as plaintext
        (garbage rows would poison dedup fingerprints downstream)."""
        from doctor_spark.kernels.pdf import extract_pdf_layout_text

        data = self._build(r=3)
        broken = data.replace(b"trailer", b"trXiler")
        assert b"/Encrypt" in broken
        content, err, rc = extract_pdf_layout_text(broken)
        assert content == "" and rc != 0

    def test_encrypt_indirect_ref_to_missing_object_fails_closed(self):
        """'/Encrypt N G R' out-of-stream whose TARGET object cannot be
        resolved (the encrypt dict itself failed to parse, or lives in an
        unparsed revision) with the trailer keyword also damaged: a
        genuinely encrypted file in this state must fail closed, not emit
        decoded-garbage rows.  An unencrypted document essentially never
        carries '/Encrypt N G R' outside stream payloads."""
        from doctor_spark.kernels.pdf import extract_pdf_layout_text
        from doctor_spark.kernels.pdfwriter import (
            PageSpec,
            build_pdf,
            text_to_lines,
        )

        plain = build_pdf([PageSpec(lines=text_to_lines("Visible body"))])
        # indirect /Encrypt reference to an object that does not exist,
        # spliced outside every stream span, trailer keyword damaged so
        # _find_encrypt cannot resolve a crypt dict either
        i = plain.index(b"1 0 obj")
        marker = b"9 0 obj\n<< /Encrypt 99 0 R >>\nendobj\n"
        spliced = (plain[:i] + marker + plain[i:]).replace(
            b"trailer", b"trXiler"
        )
        content, err, rc = extract_pdf_layout_text(spliced)
        assert content == "" and rc != 0, (content[:80], err)

    def test_encrypt_marker_inside_stream_is_ignored(self):
        """An unencrypted doc whose STREAM payload contains '/Encrypt '
        (e.g. an embedded attachment) must extract normally."""
        from doctor_spark.kernels.pdf import extract_pdf_layout_text
        from doctor_spark.kernels.pdfwriter import (
            PageSpec,
            build_pdf,
            text_to_lines,
        )

        plain = build_pdf([PageSpec(lines=text_to_lines("Visible body text"))])
        # splice the marker bytes into an existing stream payload
        i = plain.index(b"stream") + len(b"stream\n")
        spliced = plain[:i] + b"/Encrypt " + plain[i:]
        # splicing corrupts that one stream's content, but parsing must
        # neither raise nor treat the document as encrypted
        content, err, rc = extract_pdf_layout_text(spliced)
        assert "unparseable trailer" not in err

    def test_encrypt_token_in_comment_or_plain_dict_extracts(self):
        """An UNencrypted document carrying '/Encrypt' out-of-stream — in
        a comment, a string object, or a non-crypt dict — must extract
        normally: the fail-closed scan only fires in trailer/XRef regions
        or when the value resolves to a real encryption dict."""
        from doctor_spark.kernels.pdf import extract_pdf_layout_text
        from doctor_spark.kernels.pdfwriter import (
            PageSpec,
            build_pdf,
            text_to_lines,
        )

        plain = build_pdf([PageSpec(lines=text_to_lines("Visible body"))])
        for marker in (
            b"% note: /Encrypt (not really)\n",
            b"7 0 obj\n<< /Notes (/Encrypt <as text>) >>\nendobj\n",
            b"8 0 obj\n<< /Encrypt /SomeName >>\nendobj\n",
        ):
            # insert BEFORE the first object, outside every stream span
            i = plain.index(b"1 0 obj")
            spliced = plain[:i] + marker + plain[i:]
            content, err, rc = extract_pdf_layout_text(spliced)
            assert rc == 0 and "Visible body" in content, (marker, err)


class TestProportionalLayout:
    """Glyph-accurate layout regressions: TJ kerning must not split words,
    real spaces must survive, large gaps must become column padding."""

    @staticmethod
    def _build(content: bytes) -> bytes:
        # proportional font: /Widths for codes 32..126 (space 250, letters
        # varied) — presence of /Widths routes pages to the glyph engines
        widths = []
        for code in range(32, 127):
            if code == 32:
                widths.append(250)
            elif chr(code) in "iltfj":
                widths.append(280)
            elif chr(code).isupper():
                widths.append(700)
            else:
                widths.append(500)
        w_arr = ("[" + " ".join(str(w) for w in widths) + "]").encode()
        objs = {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            3: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
               b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
            4: b"<< /Length " + str(len(content)).encode() + b" >>\n"
               b"stream\n" + content + b"\nendstream",
            5: b"<< /Type /Font /Subtype /TrueType /BaseFont /FakeSerif "
               b"/FirstChar 32 /LastChar 126 /Widths " + w_arr + b" >>",
        }
        body = b"%PDF-1.4\n"
        for num, payload in objs.items():
            body += f"{num} 0 obj\n".encode() + payload + b"\nendobj\n"
        body += b"trailer\n<< /Size 6 /Root 1 0 R >>\n%%EOF\n"
        return body

    def test_tj_kerning_does_not_split_words(self):
        from doctor_spark.kernels.pdf import extract_pdf_layout_text

        content = (
            b"BT /F1 12 Tf 72 700 Td "
            b"[(TAR) -20 (RANT) -15 ( REGIONAL) ] TJ ET"
        )
        text, err, _ = extract_pdf_layout_text(self._build(content))
        assert err == ""
        assert "TARRANT REGIONAL" in text
        assert "TAR RANT" not in text

    def test_real_space_chars_survive(self):
        from doctor_spark.kernels.pdf import extract_pdf_layout_text

        content = b"BT /F1 12 Tf 72 700 Td (alpha beta gamma) Tj ET"
        text, err, _ = extract_pdf_layout_text(self._build(content))
        assert "alpha beta gamma" in text

    def test_large_gap_becomes_columns(self):
        from doctor_spark.kernels.pdf import extract_pdf_layout_text

        content = (
            b"BT /F1 12 Tf 72 700 Td (left side) Tj ET\n"
            b"BT /F1 12 Tf 400 700 Td (right side) Tj ET"
        )
        text, err, _ = extract_pdf_layout_text(self._build(content))
        line = text.splitlines()[0]
        assert line.startswith("left side")
        assert "right side" in line
        gap = line.index("right side") - len("left side")
        assert gap > 20  # ~328pt of space at a ~5.9pt cell

    def test_positioned_word_spacing_via_td(self):
        # words positioned by separate Td ops at normal spacing join with
        # single spaces, not column padding
        from doctor_spark.kernels.pdf import extract_pdf_layout_text

        content = (
            b"BT /F1 10 Tf 72 700 Td (Hello) Tj ET\n"
            b"BT /F1 10 Tf 101 700 Td (world) Tj ET"
        )
        # "Hello" = 700+500+280+280+500 = 2260/1000*10 = 22.6pt wide,
        # so x=101 leaves a ~6.4pt gap ≈ a space
        text, err, _ = extract_pdf_layout_text(self._build(content))
        assert "Hello world" in text

    def test_mixed_metric_and_metricless_fonts_keep_all_text(self):
        """A page mixing a /Widths font with a metric-less standard-14
        font must not lose the metric-less text in the glyph engines."""
        from doctor_spark.kernels.pdf import extract_pdf_layout_text

        widths = "[" + " ".join(["500"] * 95) + "]"
        objs = {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            3: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
               b"/Resources << /Font << /F1 5 0 R /F2 6 0 R >> >> "
               b"/Contents 4 0 R >>",
            5: (b"<< /Type /Font /Subtype /TrueType /BaseFont /Metric "
                b"/FirstChar 32 /LastChar 126 /Widths "
                + widths.encode() + b" >>"),
            6: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        }
        content = (
            b"BT /F1 12 Tf 72 700 Td (metric text) Tj ET\n"
            b"BT /F2 12 Tf 72 650 Td (helvetica text) Tj ET"
        )
        objs[4] = (b"<< /Length " + str(len(content)).encode()
                   + b" >>\nstream\n" + content + b"\nendstream")
        body = b"%PDF-1.4\n"
        for num, payload in sorted(objs.items()):
            body += f"{num} 0 obj\n".encode() + payload + b"\nendobj\n"
        body += b"trailer\n<< /Size 7 /Root 1 0 R >>\n%%EOF\n"
        text, err, _ = extract_pdf_layout_text(body)
        assert err == ""
        assert "metric text" in text
        assert "helvetica text" in text


class TestObjHeaderScanner:
    """_next_obj_header must reproduce the exact match set of the regex
    it replaced (``(\\d+)\\s+(\\d+)\\s+obj\\b``, leftmost non-overlapping)
    — the memchr-speed scanner is a pure performance substitution."""

    CASES = [
        b"1 0 obj << >> endobj",
        b"12  34\t\r\nobj",
        b"obj",                      # bare keyword, no header
        b" 0 obj",                   # missing object number
        b"x1 0 obj",                 # digits end at non-digit: still a match
        b"1 0 objx",                 # \b fails
        b"1 0 obj_",                 # \b fails (underscore)
        b"5 0 obj 6 0 obj",          # adjacent headers
        b"1 2 3 obj",                # leftmost-wins inside digit runs
        b"abc123 99 obj\xff",        # binary tail, \b at non-word byte
        b"7\x000 obj",               # NUL is not \s in a bytes regex
        b"1 0 obj2 0 obj",           # joined: \b fails on first, 2nd ok
        bytes(range(256)) * 3 + b" 17 5 obj",  # header after binary noise
        b"1 0 obj\n<< /Length 3 >>\nstream\nabc\nendstream\nendobj\n2 0 obj 3 endobj",
    ]

    def test_matches_regex_semantics(self):
        import re

        from doctor_spark.kernels.pdf import _next_obj_header

        obj_re = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
        for data in self.CASES:
            expect = [
                (int(m.group(1)), int(m.group(2)), m.start(), m.end())
                for m in obj_re.finditer(data)
            ]
            got, pos = [], 0
            while (h := _next_obj_header(data, pos)) is not None:
                num, gen, start, end, pos = h
                got.append((num, gen, start, end))
            assert got == expect, (data[:60], got, expect)

    def test_fuzz_matches_regex(self):
        import re

        from hypothesis import given, settings
        from hypothesis import strategies as st

        from doctor_spark.kernels.pdf import _next_obj_header

        obj_re = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
        alphabet = st.sampled_from(
            [b"0", b"1", b"9", b" ", b"\t", b"\n", b"\r", b"\x0b", b"\x0c",
             b"obj", b"ob", b"j", b"_", b"x", b"\x00", b"\xff", b"12 0 obj"]
        )

        @settings(max_examples=300, deadline=None)
        @given(st.lists(alphabet, max_size=40))
        def check(parts):
            data = b"".join(parts)
            expect = [
                (int(m.group(1)), int(m.group(2)), m.start(), m.end())
                for m in obj_re.finditer(data)
            ]
            got, pos = [], 0
            while (h := _next_obj_header(data, pos)) is not None:
                num, gen, start, end, pos = h
                got.append((num, gen, start, end))
            assert got == expect, (data, got, expect)

        check()


class TestBatchTjEquivalence:
    """The validated batch TJ path (_TJ_ARR_VALID + _TJ_BATCH findall)
    must produce byte-identical page text to the incremental token walk
    it short-circuits — pinned by running the same document through both
    (the walk is forced by neutering the validator)."""

    _build = staticmethod(TestProportionalLayout._build)

    def _both_ways(self, content: bytes, monkeypatch):
        import re as _re
        from doctor_spark.kernels import pdf as pdfmod

        batch, err_b, rc_b = pdfmod.extract_pdf_layout_text(
            self._build(content))
        never = _re.compile(rb"(?!)")
        monkeypatch.setattr(pdfmod, "_TJ_ARR_VALID", never)
        walk, err_w, rc_w = pdfmod.extract_pdf_layout_text(
            self._build(content))
        assert (err_b, rc_b) == (err_w, rc_w)
        return batch, walk

    def test_escape_forms(self, monkeypatch):
        content = (
            b"BT /F1 12 Tf 72 700 Td "
            rb"[(pre) -20 (a\(b\)c\\d) -15 (tab\there) (oct\101al) "
            rb"(cont\
inue) <4869> -30 <4 86f20> () 250 (end)] TJ ET"
        )
        batch, walk = self._both_ways(content, monkeypatch)
        assert batch == walk
        assert "a(b)c\\d" in batch and "octAal" in batch
        assert "Hi" in batch and "Ho " in batch

    def test_non_tj_array_rolls_back_identically(self, monkeypatch):
        content = (
            b"[2 1] 0 d BT /F1 12 Tf 72 700 Td "
            b"[(kept) -40 (text)] TJ ET"
        )
        batch, walk = self._both_ways(content, monkeypatch)
        assert batch == walk and "kept" in batch

    def test_fuzz_differential(self, monkeypatch):
        import random

        rng = random.Random(20260818)
        frags = [b"(abc)", b"(A B)", rb"(e\)s\(c)", rb"(\\)", b"()",
                 b"<48 65>", b"<6c6C>", b"<7>", rb"(oct\043x)",
                 rb"(nl\ncr\rtab\t)", b"(sp ace)"]
        for trial in range(40):
            toks = []
            for _ in range(rng.randrange(1, 12)):
                if rng.random() < 0.5:
                    toks.append(str(rng.randrange(-900, 900)).encode())
                else:
                    toks.append(rng.choice(frags))
            arr = b"[" + b" ".join(toks) + b"]"
            content = b"BT /F1 12 Tf 72 700 Td " + arr + b" TJ ET"
            batch, walk = self._both_ways(content, monkeypatch)
            assert batch == walk, (trial, arr)
