"""WARC source: writer/parser round trip + Spark ingest."""

import datetime as dt

import pytest

from doctor_spark.sources.warc import build_warc, parse_warc, read_warc_pages

TS = dt.datetime(2024, 3, 1, 12, 0, 0, tzinfo=dt.timezone.utc)

RECORDS = [
    {"url": "https://a.test/page1.html", "warc_ts": TS,
     "html": b"<html><body><p>one</p></body></html>"},
    {"url": "https://a.test/doc.pdf", "warc_ts": TS,
     "html": b"%PDF-1.4 fake"},
    {"url": "https://b.test/binary", "warc_ts": TS,
     "html": bytes(range(256))},
]


class TestRoundTrip:
    def test_plain(self):
        parsed = parse_warc(build_warc(RECORDS))
        assert [r["url"] for r in parsed] == [r["url"] for r in RECORDS]
        assert [r["html"] for r in parsed] == [r["html"] for r in RECORDS]
        assert parsed[0]["warc_ts"] == TS

    def test_gzip_members(self):
        parsed = parse_warc(build_warc(RECORDS, gzip_per_record=True))
        assert [r["html"] for r in parsed] == [r["html"] for r in RECORDS]

    def test_non_response_records_skipped(self):
        raw = build_warc(RECORDS[:1])
        warcinfo = (
            b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\nabcd"
            b"\r\n\r\n"
        )
        assert len(parse_warc(warcinfo + raw)) == 1

    def test_truncated_tolerated(self):
        raw = build_warc(RECORDS)
        assert len(parse_warc(raw[: len(raw) // 2])) >= 1

    def test_empty(self):
        assert parse_warc(b"") == []


def test_spark_ingest(spark, tmp_path):
    p = tmp_path / "f1.warc"
    p.write_bytes(build_warc(RECORDS))
    p2 = tmp_path / "f2.warc.gz"
    p2.write_bytes(build_warc(RECORDS[:1], gzip_per_record=True))
    pages = read_warc_pages(spark, str(tmp_path / "*.warc*"))
    rows = pages.collect()
    assert len(rows) == 4
    urls = {r["url"] for r in rows}
    assert "https://a.test/page1.html" in urls
    byurl = {r["url"]: r for r in rows}
    assert bytes(byurl["https://a.test/doc.pdf"]["html"]) == b"%PDF-1.4 fake"


def test_poison_gzip_member_tolerated():
    good = build_warc(RECORDS[:1], gzip_per_record=True)
    poisoned = good + b"\x1f\x8b\x08garbage-not-a-member" + build_warc(
        RECORDS[1:2], gzip_per_record=True
    )
    # the good leading member still parses; the poison ends the stream
    parsed = parse_warc(poisoned)
    assert len(parsed) >= 1
    assert parsed[0]["html"] == RECORDS[0]["html"]


def test_offset_dates_normalized_to_utc(spark, tmp_path):
    """A WARC-Date with a non-Z offset (+02:00, permitted by ISO 8601)
    must land as the same UTC instant as its Z-suffixed equivalent."""
    raw = build_warc(RECORDS[:1])
    shifted = raw.replace(b"2024-03-01T12:00:00Z", b"2024-03-01T14:00:00+02:00")
    assert shifted != raw
    p = tmp_path / "offset.warc"
    p.write_bytes(shifted)
    rows = read_warc_pages(spark, str(p)).collect()
    assert rows[0].warc_ts == dt.datetime(2024, 3, 1, 12, 0, 0)
