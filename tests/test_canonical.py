"""canonical_clusters: keeper selection, missing-canonical self
clusters, and the skew-safe groupBy+join plan (no window)."""

from pyspark.sql import functions as F

from doctor_spark.operators.metadata import canonical_clusters
from doctor_spark.plans.checks import physical_plan


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, url string, canonical_url string"
    )


def test_keeper_is_the_canonical_page_itself(spark):
    rows = [
        (1, "https://s/a", None),               # the canonical page
        (2, "https://s/a?print=1", "https://s/a"),
        (3, "https://m.s/a", "https://s/a"),
    ]
    got = {r["doc_id"]: (r["is_keeper"], r["cluster_size"])
           for r in canonical_clusters(_df(spark, rows)).collect()}
    assert got == {1: (True, 3), 2: (False, 3), 3: (False, 3)}


def test_fallback_keeper_when_canonical_page_absent(spark):
    # both pages declare a target that was never crawled: min id keeps
    rows = [
        (7, "https://s/x?v=1", "https://s/x"),
        (5, "https://s/x?v=2", "https://s/x"),
    ]
    got = {r["doc_id"]: r["is_keeper"]
           for r in canonical_clusters(_df(spark, rows)).collect()}
    assert got == {5: True, 7: False}


def test_no_canonical_means_singleton_self_cluster(spark):
    rows = [(1, "https://s/p", None), (2, "https://s/q", None)]
    out = canonical_clusters(_df(spark, rows)).collect()
    assert all(r["is_keeper"] and r["cluster_size"] == 1 for r in out)
    assert {r["cluster_key"] for r in out} == {"https://s/p", "https://s/q"}


def test_plan_no_window_groupby_join(spark):
    q = canonical_clusters(_df(spark, [(1, "u", None)]))
    plan = physical_plan(q)
    # skew contract: per-cluster agg (map-side partials) + a join AQE
    # can split — NEVER a window over cluster_key (unsplittable hot key)
    assert "Window" not in plan, plan
    assert "partial_min" in plan or "partial_count" in plan, plan
    assert "EvalPython" not in plan, plan
