"""From-scratch WPD kernel: round trips + fail-closed validation."""

from doctor_spark.kernels.extract import extract_document
from doctor_spark.kernels.wpd import build_wpd, extract_from_wpd_bytes


class TestWpdRoundTrip:
    def test_simple(self):
        text = "MEMORANDUM OF LAW\nSecond line here\nThird"
        content, err, rc = extract_from_wpd_bytes(build_wpd(text))
        assert (content, err, rc) == (text, "", 0)

    def test_dispatch_route(self):
        res = extract_document(
            "https://court.test/brief.wpd", build_wpd("brief body text")
        )
        assert (res.content, res.extension, res.err) == (
            "brief body text", "wpd", ""
        )

    def test_junk_after_magic_fails_closed(self):
        # random bytes after the WPC magic: header validation must reject,
        # yielding an err row, never garbage text
        content, err, rc = extract_from_wpd_bytes(b"\xffWPC" + bytes(range(200)))
        assert content == "" and rc == 1

    def test_encrypted_rejected(self):
        raw = bytearray(build_wpd("secret"))
        raw[12] = 0x42  # nonzero encryption key
        content, err, rc = extract_from_wpd_bytes(bytes(raw))
        assert rc == 1 and "encrypted" in err

    def test_truncated(self):
        assert extract_from_wpd_bytes(b"\xffWPC\x10")[2] == 1

    def test_unknown_function_groups_skipped(self):
        raw = bytearray(build_wpd("before after"))
        # splice a 0xD5 ... 0xD5 function group into the document area
        raw[16 + 6 : 16 + 6] = bytes([0xD5, 1, 2, 3, 0xD5])
        content, _, rc = extract_from_wpd_bytes(bytes(raw))
        assert rc == 0 and content == "before after"
