"""KWIC concordance — positions, edge contexts, map-only plan."""

import pytest
from pyspark.sql import functions as F

from doctor_spark.operators.concordance import kwic
from doctor_spark.plans.checks import (
    assert_jvm_only,
    count_exchanges,
    physical_plan,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "Spark runs on the cluster and spark scales"),
            (2, "spark"),
            (3, "no hits here"),
            (4, "the spark"),
            (5, "   "),
            (6, None),
        ],
        "doc_id long, text string",
    )


def test_positions_and_contexts(spark, corpus):
    out = kwic(corpus, "spark", k=3)
    rows = {(r.doc_id, r.pos): r for r in out.collect()}
    assert set(rows) == {(1, 0), (1, 6), (2, 0), (4, 1)}
    r = rows[(1, 0)]                       # doc start: empty left
    assert r.left_ctx == "" and r.right_ctx == "runs on the"
    r = rows[(1, 6)]
    assert r.left_ctx == "the cluster and" and r.right_ctx == "scales"
    r = rows[(2, 0)]                       # singleton doc: both empty
    assert r.left_ctx == "" and r.right_ctx == ""
    r = rows[(4, 1)]                       # short left clamps
    assert r.left_ctx == "the" and r.right_ctx == ""


def test_k_window(spark, corpus):
    out = kwic(corpus, "spark", k=1)
    r = {(x.doc_id, x.pos): x for x in out.collect()}[(1, 6)]
    assert r.left_ctx == "and" and r.right_ctx == "scales"


def test_case_folds_and_no_substring_match(spark):
    d = spark.createDataFrame(
        [(1, "SPARK sparkle spark")], "doc_id long, text string"
    )
    out = kwic(d, "spark", k=2).collect()
    assert {(r.pos) for r in out} == {0, 2}  # sparkle is NOT a hit


def test_term_injection_rejected(spark, corpus):
    with pytest.raises(ValueError):
        kwic(corpus, "x' OR '1", k=2)


def test_map_only_plan(spark, corpus):
    out = kwic(corpus, "spark", k=3)
    assert_jvm_only(out)
    assert count_exchanges(out) == 0
    assert "Generate" in physical_plan(out, "simple")
