"""Domain blocklist gate: label-suffix matching, most-specific-match
reporting, and the zero-page-side-shuffle plan contract."""

from pyspark.sql import functions as F

from doctor_spark.operators.blocklist import domain_blocklist_mark


def _run(spark, urls, domains, **kw):
    pages = spark.createDataFrame([(u,) for u in urls], "url string")
    bl = spark.createDataFrame([(d,) for d in domains], "domain string")
    out = domain_blocklist_mark(pages, bl, **kw)
    return out, {r["url"]: (r["blocked"], r["blocked_domain"]) for r in out.collect()}


def test_suffix_matching_is_label_exact(spark):
    out, got = _run(
        spark,
        [
            "https://example.com/a",            # exact host
            "https://a.b.example.com/b",        # deep subdomain
            "https://goodexample.com/c",        # NOT a label suffix
            "https://example.com.evil.net/d",   # listed labels not a suffix
            "https://other.net/e",
        ],
        ["example.com"],
    )
    assert got["https://example.com/a"] == (True, "example.com")
    assert got["https://a.b.example.com/b"] == (True, "example.com")
    assert got["https://goodexample.com/c"] == (False, None)
    assert got["https://example.com.evil.net/d"] == (False, None)
    assert got["https://other.net/e"] == (False, None)


def test_most_specific_match_reported(spark):
    _, got = _run(
        spark,
        ["https://bad.h.example/x", "https://www.h.example/y"],
        ["h.example", "bad.h.example"],
    )
    assert got["https://bad.h.example/x"] == (True, "bad.h.example")
    assert got["https://www.h.example/y"] == (True, "h.example")


def test_duplicate_blocklist_rows_do_not_fan_out(spark):
    out, got = _run(
        spark,
        ["https://example.com/a", "https://x.example.com/b"],
        ["example.com", "example.com", "example.com"],
    )
    assert out.count() == 2
    assert got["https://example.com/a"] == (True, "example.com")


def test_hostless_and_single_label_urls(spark):
    _, got = _run(
        spark,
        ["not a url", "https://localhost/x", "https://blocked/x"],
        ["blocked"],
    )
    assert got["not a url"] == (False, None)
    assert got["https://localhost/x"] == (False, None)
    assert got["https://blocked/x"] == (True, "blocked")


def test_plan_zero_page_side_shuffle(spark):
    """The gate must stay a single map stage over the corpus: broadcast
    probes only — no Exchange hashpartitioning over the pages relation,
    no explode, no re-aggregation."""
    pages = spark.createDataFrame(
        [(f"https://s{i}.h{i % 7}.example/p{i}",) for i in range(100)],
        "url string",
    )
    bl = spark.createDataFrame(
        [(f"h{j}.example",) for j in range(5)], "domain string"
    )
    out = domain_blocklist_mark(pages, bl)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in final
    assert "SortMergeJoin" not in final and "ShuffledHashJoin" not in final
    assert "Generate" not in final  # no explode
    # the only hash exchange allowed is the blocklist's own dedup — a
    # dimension-side shuffle of the small table, never the corpus
    import re

    keyed = re.findall(r"Exchange hashpartitioning\((\w+)", final)
    assert all(k.startswith("_bl") for k in keyed), final
