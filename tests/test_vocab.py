"""Vocabulary-growth curve — arrival semantics, buckets, cumulative."""

import pytest
from pyspark.sql import functions as F

from doctor_spark.operators.vocab import vocab_growth
from doctor_spark.plans.checks import assert_jvm_only


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (0, "a b c"),
            (1, "a b"),
            (2, "c d"),          # d arrives in bucket 1
            (3, "   "),          # blank: excluded from doc counts too
            (4, "a e"),          # e arrives in bucket 2
            (5, "E"),            # case folds: no new term
        ],
        "doc_id long, text string",
    )


def test_curve(spark, corpus):
    out = vocab_growth(corpus, bucket_docs=2)
    rows = {r.bucket: r for r in out.collect()}
    assert rows[0].n_docs == 2 and rows[0].n_new_terms == 3
    assert rows[1].n_docs == 1 and rows[1].n_new_terms == 1  # d
    assert rows[2].n_docs == 2 and rows[2].n_new_terms == 1  # e
    assert rows[2].n_docs_cum == 5 and rows[2].vocab_size == 5


def test_monotone_and_totals(spark, corpus):
    out = vocab_growth(corpus, bucket_docs=2).orderBy("bucket").collect()
    vs = [r.vocab_size for r in out]
    assert vs == sorted(vs)
    assert vs[-1] == 5  # a b c d e
    assert sum(r.n_new_terms for r in out) == vs[-1]


def test_empty_bucket_absent_not_zero(spark):
    # bucket rows exist only where documents exist (doc ids 0 and 9)
    d = spark.createDataFrame(
        [(0, "x"), (9, "y")], "doc_id long, text string"
    )
    out = vocab_growth(d, bucket_docs=2)
    assert {r.bucket for r in out.collect()} == {0, 4}


def test_jvm_only(spark, corpus):
    assert_jvm_only(vocab_growth(corpus, bucket_docs=2))
