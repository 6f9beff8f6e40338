"""MinHash→Levenshtein verify rung: false-positive rejection, score
arithmetic, threshold boundary, and the JVM-only verify stage."""

import pytest
from pyspark.sql import functions as F

MICRO = 1_000_000


def verified(*a, **kw):
    from doctor_spark.operators.dedup import verified_neardup_pairs as f

    return f(*a, **kw)


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base),
        (2, base),                          # exact duplicate: sim 1e6
        (3, base + " extra tail words"),    # near-dup
        (4, "completely different text about spark and data pipelines"),
        (5, "short one two three"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestVerifiedNeardup:
    def test_exact_dup_scores_million(self, spark, docs):
        out = {
            (r["id_a"], r["id_b"]): (r["lev"], r["sim_micro"])
            for r in verified(docs).collect()
        }
        assert out[(1, 2)] == (0, MICRO)

    def test_scores_match_manual(self, spark, docs):
        rows = {(r["id_a"], r["id_b"]): r
                for r in verified(docs, sim_threshold_micro=0).collect()}
        texts = {r["doc_id"]: r["text"] for r in docs.collect()}
        for (ia, ib), r in rows.items():
            ta, tb = texts[ia], texts[ib]
            mx = max(len(ta), len(tb))
            assert r["sim_micro"] == ((mx - r["lev"]) * MICRO) // mx

    def test_threshold_cuts(self, spark, docs):
        all_pairs = verified(docs, sim_threshold_micro=0).count()
        strict = verified(docs, sim_threshold_micro=999_999).collect()
        assert {(r["id_a"], r["id_b"]) for r in strict} == {(1, 2)}
        assert all_pairs >= 3  # 1-2, 1-3, 2-3 at least proposed

    def test_candidates_only_no_cross_product(self, spark, docs):
        # doc 4/5 share no shingle bands with 1-3: never scored even
        # at threshold 0 (the sketch gates the verify)
        pairs = {
            (r["id_a"], r["id_b"])
            for r in verified(docs, sim_threshold_micro=0).collect()
        }
        flat = {i for p in pairs for i in p}
        assert 4 not in flat and 5 not in flat

    def test_verify_stage_is_jvm_only(self, spark, docs):
        from doctor_spark.plans.checks import physical_plan

        plan = physical_plan(verified(docs))
        # the ONLY Python eval is the minhash band signature UDF — the
        # static plan shows its subtree up to 4x (self-join + text
        # attach; runtime dedupes via ReusedExchange, pinned in
        # test_plans.py for minhash) — and the levenshtein verify
        # itself is pure codegen: no row-at-a-time Python anywhere
        assert plan.count("BatchEvalPython") == 0
        assert 1 <= plan.count("ArrowEvalPython") <= 4
        assert "levenshtein" in plan
