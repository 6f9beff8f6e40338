"""Zipf fit + count-of-counts — exact-arithmetic replica, rank
tie-break, cap behavior."""

import math

import pytest
from pyspark.sql import functions as F

MICRO = 1_000_000


def _ops():
    from doctor_spark.operators import zipf

    return zipf


def _replica_fit(freqs, top_k=1000):
    """freqs: dict term -> count.  Replays the operator's arithmetic."""
    ranked = sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
    xs = [
        math.floor(math.log(float(i + 1)) * MICRO + 0.5)
        for i in range(len(ranked))
    ]
    ys = [
        math.floor(math.log(float(c)) * MICRO + 0.5) for _, c in ranked
    ]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    return (
        n,
        math.floor(slope * float(MICRO) + 0.5),
        math.floor(intercept + 0.5),
    )


CORPUS = [
    (1, "the the the the cat cat sat mat"),
    (2, "the cat sat on a mat mat"),
    (3, "a dog sat"),
    (4, None),
]
FREQS = {
    "the": 5, "cat": 3, "sat": 3, "mat": 3, "a": 2, "on": 1, "dog": 1,
}


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


class TestZipf:
    def test_fit_matches_replica(self, spark, docs):
        out = _ops().zipf_fit(docs).collect()[0]
        n, s, i = _replica_fit(FREQS)
        assert (out["n_ranks"], out["slope_micro"],
                out["intercept_micro"]) == (n, s, i)
        # a decreasing rank-frequency curve fits a negative slope
        assert out["slope_micro"] < 0

    def test_top_k_cap(self, spark, docs):
        out = _ops().zipf_fit(docs, top_k=3).collect()[0]
        n, s, i = _replica_fit(FREQS, top_k=3)
        assert (out["n_ranks"], out["slope_micro"],
                out["intercept_micro"]) == (n, s, i)
        assert out["n_ranks"] == 3

    def test_freq_of_freqs(self, spark, docs):
        out = {
            r["freq"]: r["n_terms"]
            for r in _ops().freq_of_freqs(docs).collect()
        }
        assert out == {5: 1, 3: 3, 2: 1, 1: 2}

    def test_rank_tiebreak_is_term_order(self, spark):
        # cat/mat/sat all have freq 3: ranks must assign
        # alphabetically, which the replica also does — equality above
        # would fail otherwise; here pin it structurally
        s = _ops()
        docs = s.term_frequencies(
            pytest.importorskip("pyspark.sql").SparkSession
            .getActiveSession()
            .createDataFrame(CORPUS, "doc_id long, text string")
        )
        top = (
            docs.orderBy(F.col("freq").desc(), F.col("term").asc())
            .limit(4)
            .collect()
        )
        assert [r["term"] for r in top] == ["the", "cat", "mat", "sat"]
