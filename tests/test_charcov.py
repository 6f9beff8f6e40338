"""Character coverage — counts, rank ties, cumulative micro."""

import pytest
from pyspark.sql import functions as F

from doctor_spark.operators.charcov import char_coverage


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(1, "aab"), (2, "ab"), (3, None), (4, "")],
        "doc_id long, text string",
    )


def test_counts_rank_cum(spark, corpus):
    out = char_coverage(corpus).orderBy("rank").collect()
    # a:3 b:2 — total 5
    assert [(r.ch, r.n, r.rank) for r in out] == [("a", 3, 1), ("b", 2, 2)]
    assert out[0].cum_micro == 3 * 1_000_000 // 5
    assert out[-1].cum_micro == 1_000_000


def test_tie_breaks_by_char(spark):
    d = spark.createDataFrame([(1, "ba")], "doc_id long, text string")
    out = char_coverage(d).orderBy("rank").collect()
    assert [r.ch for r in out] == ["a", "b"]


def test_unicode_codepoints(spark):
    d = spark.createDataFrame([(1, "ñ ñ")], "doc_id long, text string")
    rows = {r.ch: r.n for r in char_coverage(d).collect()}
    assert rows == {"ñ": 2, " ": 1}


def test_histogram_fanout_bounded(spark):
    # 1000 chars, 2 distinct: the explode sees 2 rows for this doc
    d = spark.createDataFrame(
        [(1, "ab" * 500)], "doc_id long, text string"
    )
    out = char_coverage(d).collect()
    assert {(r.ch, r.n) for r in out} == {("a", 500), ("b", 500)}
