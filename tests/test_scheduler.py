"""Fetch-scheduler contract: politeness invariants (one worker per
host, delay-spaced slots, deterministic ordering), the hot-host cap,
and the WindowGroupLimit plan shape."""

from pyspark.sql import functions as F

from doctor_spark.operators.scheduler import fetch_schedule

SF = "/root/testdata/sf0.001"


def _frontier(spark, rows):
    return spark.createDataFrame(
        rows, "url string, host string, priority long, crawl_delay_sec long"
    )


def test_ordering_slots_and_worker_unity(spark):
    rows = [
        ("https://a/1", "a", 5, 10),
        ("https://a/2", "a", 9, 10),
        ("https://a/3", "a", 9, 10),  # priority tie -> url ASC
        ("https://b/1", "b", 1, 3),
    ]
    out = fetch_schedule(_frontier(spark, rows), k_workers=4).collect()
    by_url = {r.url: r for r in out}
    # (priority DESC, url ASC): /2 before /3 before /1
    assert [by_url[f"https://a/{i}"].seq for i in (2, 3, 1)] == [0, 1, 2]
    # fetch_at = seq * delay
    assert [by_url[f"https://a/{i}"].fetch_at_sec for i in (2, 3, 1)] == [
        0, 10, 20,
    ]
    # all of a host's urls land on ONE worker; range is [0, k)
    workers = {r.url: r.worker for r in out}
    assert len({workers[f"https://a/{i}"] for i in (1, 2, 3)}) == 1
    assert all(0 <= r.worker < 4 for r in out)
    assert by_url["https://b/1"].fetch_at_sec == 0


def test_per_host_cap_drops_tail(spark):
    rows = [(f"https://h/{i:03d}", "h", 0, 1) for i in range(20)]
    out = fetch_schedule(
        _frontier(spark, rows), k_workers=2, per_host_cap=5
    ).collect()
    assert len(out) == 5
    # priority all-equal -> url ASC keeps the lexicographically first 5
    assert sorted(r.url for r in out) == [
        f"https://h/{i:03d}" for i in range(5)
    ]


def test_worker_band_is_salt_stable(spark):
    rows = [("u", "host.example", 0, 1)]
    a = fetch_schedule(_frontier(spark, rows), k_workers=64).collect()
    b = fetch_schedule(_frontier(spark, rows), k_workers=64).collect()
    assert a[0].worker == b[0].worker
    c = fetch_schedule(
        _frontier(spark, rows), k_workers=64, salt="other"
    ).collect()
    assert 0 <= c[0].worker < 64  # salted band still in range


def test_plan_one_exchange_window_group_limit(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    host = F.concat(F.lit("h"), (F.col("doc_id") % 7).cast("string"))
    frontier = docs.select(
        F.concat(F.lit("u/"), F.col("doc_id")).alias("url"),
        host.alias("host"),
        (F.col("doc_id") % 5).cast("long").alias("priority"),
        F.lit(2).cast("long").alias("crawl_delay_sec"),
    )
    q = fetch_schedule(frontier, k_workers=8, per_host_cap=3)
    q.collect()
    plan = q._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") == 1, final
    assert "BroadcastExchange" not in final
    # capped rank pushes down as a bounded per-key heap
    assert "WindowGroupLimit" in final, final
    assert "EvalPython" not in final, final  # pure codegen
