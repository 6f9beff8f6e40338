"""Web-date normalization (typed cast for the ingest date fields) —
pure JVM Column expressions, differential-tested against Python
datetime on every format family."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_parse_web_date_formats(spark):
    from doctor_spark.functions.dates import parse_web_date

    cases = [
        ("2026-08-19T06:30:00Z", "2026-08-19"),
        ("2026-08-19T23:30:00-02:00", "2026-08-20"),  # rolls FORWARD to UTC
        ("2026-08-19T01:30:00+05:30", "2026-08-18"),  # rolls back
        ("2026-08-19T06:30:00", "2026-08-19"),  # offsetless == UTC
        ("Tue, 18 Aug 2026 23:59:59 GMT", "2026-08-18"),
        ("Wed, 19 Aug 2026 00:00:01 GMT", "2026-08-19"),
        ("2026/08/07", "2026-08-07"),
        (" 2026-08-19 ", "2026-08-19"),  # trimmed
        ("not a date", None),
        ("2026-13-45", None),  # invalid components stay NULL under ANSI
        ("", None),
        (None, None),
    ]
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(cases)], "i int, raw string"
    )
    got = {
        r.i: r.day
        for r in df.select("i", parse_web_date(F.col("raw")).alias("day"))
        .collect()
    }
    for i, (raw, want) in enumerate(cases):
        assert got[i] == want, (raw, got[i], want)


def test_parse_web_date_zero_python_plan(spark):
    """The cast must stay in whole-stage codegen: no Python evaluation,
    no shuffle."""
    from doctor_spark.functions.dates import parse_web_date

    df = spark.read.parquet(f"{SF}/documents.parquet").select(
        parse_web_date(F.concat(F.lit("2026-08-1"), (F.col("doc_id") % 9)
                                .cast("string"))).alias("day")
    )
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "Python" not in final and "Exchange" not in final, final
    # the *(N) stage prefix is the compact WholeStageCodegen marker
    assert "*(1)" in final, final
