"""WARC revisit assignment — original pick, cross-URL dedup, bytes."""

import hashlib

import pytest
from pyspark.sql import functions as F

from doctor_spark.operators.revisit import revisit_assign, revisit_records
from doctor_spark.plans.checks import assert_jvm_only, physical_plan


@pytest.fixture(scope="module")
def captures(spark):
    return spark.createDataFrame(
        [
            # same URL recaptured, identical payload: later one revisits
            ("https://a.example/p", "2024-01-01T00:00:00Z", "body A"),
            ("https://a.example/p", "2024-01-05T00:00:00Z", "body A"),
            # identical payload at a DIFFERENT url: cross-url revisit
            ("https://b.example/q", "2024-01-03T00:00:00Z", "body A"),
            # same date as the original, url breaks the tie
            ("https://z.example/r", "2024-01-01T00:00:00Z", "body A"),
            # unique payload: original, no revisit
            ("https://c.example/s", "2024-01-02T00:00:00Z", "body C"),
            # recapture with CHANGED payload: NOT a revisit
            ("https://a.example/p", "2024-01-09T00:00:00Z", "body A v2"),
            ("https://n.example/x", "2024-01-02T00:00:00Z", None),
        ],
        "url string, date_s string, text string",
    )


def test_assignment(spark, captures):
    rows = {(r.url, r.date_s): r for r in revisit_assign(captures).collect()}
    assert len(rows) == 6  # NULL text dropped
    orig = rows[("https://a.example/p", "2024-01-01T00:00:00Z")]
    assert not orig.is_revisit and orig.refers_url is None
    for key in (
        ("https://a.example/p", "2024-01-05T00:00:00Z"),
        ("https://b.example/q", "2024-01-03T00:00:00Z"),
        ("https://z.example/r", "2024-01-01T00:00:00Z"),  # url tiebreak
    ):
        r = rows[key]
        assert r.is_revisit
        assert r.refers_url == "https://a.example/p"
        assert r.refers_date == "2024-01-01T00:00:00Z"
    assert not rows[("https://c.example/s", "2024-01-02T00:00:00Z")].is_revisit
    assert not rows[("https://a.example/p", "2024-01-09T00:00:00Z")].is_revisit


def test_record_bytes_golden(spark, captures):
    out = revisit_records(revisit_assign(captures))
    r = {
        (x.url, x.date_s): x for x in out.collect()
    }[("https://b.example/q", "2024-01-03T00:00:00Z")]
    digest = hashlib.md5(b"body A").hexdigest()
    rid = hashlib.md5(
        b"https://b.example/q#2024-01-03T00:00:00Z#revisit"
    ).hexdigest()
    rid = f"{rid[0:8]}-{rid[8:12]}-{rid[12:16]}-{rid[16:20]}-{rid[20:32]}"
    expected = (
        "WARC/1.0\r\n"
        "WARC-Type: revisit\r\n"
        "WARC-Target-URI: https://b.example/q\r\n"
        "WARC-Date: 2024-01-03T00:00:00Z\r\n"
        f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
        "WARC-Refers-To-Target-URI: https://a.example/p\r\n"
        "WARC-Refers-To-Date: 2024-01-01T00:00:00Z\r\n"
        f"WARC-Payload-Digest: md5:{digest}\r\n"
        "WARC-Profile: http://netpreserve.org/warc/1.1/revisit/"
        "identical-payload-digest\r\n"
        "Content-Length: 0\r\n\r\n\r\n\r\n"
    ).encode()
    assert bytes(r.record) == expected


def test_originals_carry_no_record(spark, captures):
    out = revisit_records(revisit_assign(captures))
    assert out.where(
        ~F.col("is_revisit") & F.col("record").isNotNull()
    ).count() == 0


def test_plan(spark, captures):
    out = revisit_records(revisit_assign(captures))
    assert_jvm_only(out)
    plan = physical_plan(out, "simple")
    assert "CartesianProduct" not in plan
    # min(struct) aggregation must partial-aggregate map-side
    assert "partial_min" in physical_plan(out, "formatted").lower() or \
        "HashAggregate" in plan
