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


# ----------------------------------------------------------------- WET


class TestWet:
    def test_record_bytes_and_roundtrip(self, spark):
        from pyspark.sql import functions as F

        from doctor_spark.sources.warc import parse_wet, wet_record

        df = spark.createDataFrame(
            [
                ("https://a.example/1", "2024-01-02T00:00:00Z", "Hello."),
                # Content-Length must count UTF-8 BYTES, not chars
                ("https://a.example/2", "2024-01-03T00:00:00Z", "café ✓"),
                ("https://a.example/3", "2024-01-04T00:00:00Z", ""),
            ],
            "url string, date_s string, text string",
        )
        blobs = [
            bytes(r[0])
            for r in df.select(
                wet_record(F.col("url"), F.col("date_s"), F.col("text"))
            ).collect()
        ]
        one = blobs[0].decode()
        assert one.startswith("WARC/1.0\r\nWARC-Type: conversion\r\n")
        assert "Content-Length: 6\r\n\r\nHello.\r\n\r\n" in one
        # 'café ✓' = 9 UTF-8 bytes (é=2, ✓=3), 6 chars — byte count wins
        assert "Content-Length: 9\r\n" in blobs[1].decode()
        recs = parse_wet(b"".join(blobs))
        assert [(r["url"], r["text"]) for r in recs] == [
            ("https://a.example/1", "Hello."),
            ("https://a.example/2", "café ✓"),
            ("https://a.example/3", ""),
        ]

    def test_parse_wet_poison_tolerated(self):
        from doctor_spark.sources.warc import parse_wet

        junk = (
            b"WARC/1.0\r\nContent-Length: nope\r\n\r\n"
            b"WARC/1.0\r\nWARC-Target-URI: u\r\nContent-Length: 2\r\n\r\nok\r\n\r\n"
        )
        recs = parse_wet(junk)
        assert [r["text"] for r in recs] == ["ok"]
        assert parse_wet(b"") == []

    def test_partition_files_roundtrip(self, spark):
        from pyspark.sql import functions as F

        from doctor_spark.sources.warc import (
            parse_wet,
            wet_partition_files,
            wet_record,
        )

        docs = spark.range(0, 200, 1, 4).select(
            F.concat(F.lit("https://d/"), F.col("id")).alias("url"),
            F.lit("2024-01-01T00:00:00Z").alias("date_s"),
            F.concat(F.lit("text "), F.col("id")).alias("text"),
        )
        files = wet_partition_files(
            docs.select(
                wet_record(
                    F.col("url"), F.col("date_s"), F.col("text")
                ).alias("wet_record")
            )
        ).collect()
        assert sum(r.n_records for r in files) == 200
        seen = []
        for r in files:
            members = parse_wet(bytes(r.wet_file))
            assert len(members) == r.n_records
            seen += [m["url"] for m in members]
        assert sorted(seen) == sorted(f"https://d/{i}" for i in range(200))

    def test_wet_plan_codegen_only(self, spark):
        from pyspark.sql import functions as F

        from doctor_spark.sources.warc import wet_record

        df = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).select(
            wet_record(
                F.concat(F.lit("u/"), F.col("doc_id")),
                F.lit("2024-01-01T00:00:00Z"),
                F.col("text"),
            ).alias("r")
        ).select(F.md5("r"))
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert "Exchange" not in final, final
        assert "EvalPython" not in final, final  # zero Python
        # '*(1)' prefix = whole-stage-codegen stage in the string plan
        assert final.lstrip().startswith("*(1)"), final


# ----------------------------------------------------------------- WAT


class TestWat:
    def test_record_bytes(self, spark):
        from pyspark.sql import functions as F

        from doctor_spark.sources.warc import wat_record

        df = spark.createDataFrame(
            [("https://a.example/1", "2024-01-02T00:00:00Z", '{"k":"café"}')],
            "url string, date_s string, payload string",
        )
        blob = bytes(
            df.select(
                wat_record(F.col("url"), F.col("date_s"), F.col("payload"))
            ).collect()[0][0]
        )
        s = blob.decode()
        assert s.startswith("WARC/1.0\r\nWARC-Type: metadata\r\n")
        assert "Content-Type: application/json\r\n" in s
        # payload length counts UTF-8 bytes (é = 2)
        assert 'Content-Length: 13\r\n\r\n{"k":"café"}\r\n\r\n' in s
        # record id differs from the WET record id of the same url
        import hashlib

        wat_h = hashlib.md5(b"https://a.example/1#wat").hexdigest()
        assert f"urn:uuid:{wat_h[:8]}-" in s

    def test_plan_codegen_only(self, spark):
        from pyspark.sql import functions as F

        from doctor_spark.plans.checks import assert_jvm_only, count_exchanges
        from doctor_spark.sources.warc import wat_record

        df = spark.range(10).select(
            F.concat(F.lit("https://e/"), F.col("id")).alias("url"),
            F.lit("2024-01-01T00:00:00Z").alias("d"),
            F.lit("{}").alias("p"),
        )
        out = df.select(
            wat_record(F.col("url"), F.col("d"), F.col("p")).alias("rec")
        )
        assert_jvm_only(out)
        assert count_exchanges(out) == 0
