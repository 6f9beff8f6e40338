"""Count-min heavy hitters: exactness under forced collisions, and the
no-underestimate property that makes the prefilter safe."""

import random

import pytest
from pyspark.sql import functions as F

from doctor_spark.operators.sketches import (
    cms_estimate,
    cms_matrix,
    cms_sketch_df,
    explode_tokens,
    heavy_hitters,
)


@pytest.fixture(scope="module")
def zipf_docs(spark):
    """Zipf-ish corpus: a few very hot tokens, a long unique tail, plus
    whitespace-class edge cases (VT, FF, repeated separators)."""
    rng = random.Random(42)
    hot = [f"hot{i}" for i in range(8)]
    rows = []
    for d in range(120):
        toks = []
        for h in hot:
            toks += [h] * rng.randrange(2, 6)
        toks += [f"tail{d}_{j}" for j in range(rng.randrange(3, 10))]
        rng.shuffle(toks)
        sep = rng.choice([" ", "\t", "\x0b", "\f", "  "])
        rows.append((d, sep.join(toks).upper() if d % 3 else sep.join(toks)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _naive(docs, threshold):
    return {
        (r["token"], r["cnt"])
        for r in explode_tokens(docs)
        .groupBy("token").agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") >= threshold)
        .collect()
    }


def test_exact_at_tiny_width_with_collisions(zipf_docs):
    # width 16 << distinct tokens: heavy collisions guaranteed; the
    # rescore must still make the output identical to the naive plan
    for threshold in (50, 200):
        got = {
            (r["token"], r["cnt"])
            for r in heavy_hitters(zipf_docs, threshold, width=16).collect()
        }
        assert got == _naive(zipf_docs, threshold)


def test_estimate_never_underestimates(zipf_docs):
    toks = explode_tokens(zipf_docs)
    sk = cms_matrix(cms_sketch_df(toks, width=32), width=32)
    truth = toks.groupBy("token").agg(F.count("*").alias("cnt")).collect()
    assert truth
    for r in truth:
        assert cms_estimate(sk, r["token"]) >= r["cnt"], r["token"]
    # total mass conservation per row: every row of the sketch sums to
    # the total token count
    total = sum(r["cnt"] for r in truth)
    assert (sk.sum(axis=1) == total).all()


def test_empty_and_whitespace_only_docs(spark):
    docs = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, "\t\x0b\f"), (3, "a a a")],
        "doc_id long, text string",
    )
    got = {(r["token"], r["cnt"])
           for r in heavy_hitters(docs, 2, width=16).collect()}
    assert got == {("a", 3)}
