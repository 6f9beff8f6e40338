"""Gale–Church bitext alignment: kernel spec + operator plan contract."""

import math

import pytest

from doctor_spark.kernels.bitext import (
    MAX_CELLS, bead_cost, gale_church_align,
)
from doctor_spark.kernels.sentences import split_sentences

SF = "/root/testdata/sf0.001"


def _align_texts(src, tgt):
    ss, ts = split_sentences(src), split_sentences(tgt)
    return gale_church_align([len(x) for x in ss], [len(x) for x in ts])


class TestKernel:
    def test_perfect_one_one_run(self):
        beads = _align_texts(
            "Alpha alpha one. Bravo bravo two. Charlie charlie three.",
            "Alfa alfa eins. Brava brava zwei. Karla karla drei.",
        )
        assert beads == [(0, 1, 0, 1), (1, 1, 1, 1), (2, 1, 2, 1)]

    def test_two_one_merge_between_anchors(self):
        beads = _align_texts(
            "Anchor sentence number one here. Aa bb. Cc dd. "
            "Anchor sentence number two here.",
            "Anker satz nummer eins hier. Aa bb und cc dd zusammen. "
            "Anker satz nummer zwei hier.",
        )
        assert beads == [(0, 1, 0, 1), (1, 2, 1, 1), (3, 1, 2, 1)]

    def test_short_insertion_absorbs_into_one_two(self):
        # canonical Gale-Church behavior: a short inserted sentence is
        # cheaper merged into a neighboring 1-2 bead (penalty 230) than
        # as a standalone 0-1 deletion (penalty 450)
        beads = _align_texts(
            "Anchor sentence number one here. Anchor sentence number two here.",
            "Anker satz nummer eins hier. Eingefugt. "
            "Anker satz nummer zwei hier.",
        )
        assert beads == [(0, 1, 0, 2), (1, 1, 2, 1)]

    def test_empty_target_gives_one_zero_beads(self):
        assert _align_texts("Solo one. Solo two.", "") == [
            (0, 1, 0, 0), (1, 1, 0, 0),
        ]

    def test_empty_source_gives_zero_one_beads(self):
        assert _align_texts("", "Solo eins. Solo zwei.") == [
            (0, 0, 0, 1), (0, 0, 1, 1),
        ]

    def test_both_empty(self):
        assert gale_church_align([], []) == []

    def test_none_text_is_empty(self):
        assert split_sentences(None) == []

    def test_max_cells_guard_returns_none(self):
        n = int(math.isqrt(MAX_CELLS)) + 1
        assert gale_church_align([10] * n, [10] * n) is None

    def test_bead_cost_monotone_in_mismatch(self):
        # a worse length mismatch never costs less
        base = bead_cost(100, 100, 1, 1)
        worse = bead_cost(100, 200, 1, 1)
        worst = bead_cost(100, 400, 1, 1)
        assert base < worse < worst

    def test_bead_cost_finite_on_pathological_lengths(self):
        assert math.isfinite(bead_cost(1, 100_000, 1, 1))

    def test_penalties_order_one_one_cheapest(self):
        # equal-length beads: only the type penalty differs
        c11 = bead_cost(50, 50, 1, 1)
        c21 = bead_cost(50, 50, 2, 1)
        c22 = bead_cost(50, 50, 2, 2)
        c10 = bead_cost(50, 0, 1, 0)
        assert c11 < c21 < c22 < c10


class TestOperator:
    @pytest.fixture(scope="class")
    def beads_df(self, spark):
        from pyspark.sql import functions as F

        from doctor_spark.operators.bitext import bitext_beads

        df = spark.read.parquet(f"{SF}/documents.parquet").select(
            "doc_id",
            F.lit("Alpha alpha one. Bravo bravo two.").alias("src_text"),
            F.lit("Alfa alfa eins. Brava brava zwei.").alias("tgt_text"),
        )
        return bitext_beads(df)

    def test_rows_and_texts(self, beads_df):
        from pyspark.sql import functions as F

        rows = (
            beads_df.where(F.col("doc_id") == 1)
            .orderBy("bead").collect()
        )
        assert [(r.bead, r.ok, r.n_src, r.n_tgt) for r in rows] == [
            (0, True, 1, 1), (1, True, 1, 1),
        ]
        assert rows[0].src_text == "Alpha alpha one."
        assert rows[0].tgt_text == "Alfa alfa eins."
        assert rows[1].src_text == "Bravo bravo two."

    def test_plan_map_only(self, beads_df):
        plan = beads_df._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert "Exchange" not in final, final
        assert final.count("ArrowEvalPython") == 1, final
        assert "Generate" in final, final


class TestBitextUrlPairs:
    """bitext_url_pairs — pairing semantics and plan shape."""

    @pytest.fixture(scope="class")
    def pairs_df(self, spark):
        from doctor_spark.operators.bitext import bitext_url_pairs

        urls = [
            "https://w.s1.example/en/p1",
            "https://w.s1.example/fr/p1",
            "https://w.s1.example/de-DE/p1",
            "https://w.s1.example/en/p1?utm_source=x",  # same (stem, en)
            "https://es.h2.example/p/2",
            "https://pt.h2.example/p/2",
            "https://plain.example/about",              # never pairs
            "https://w.s3.example/en/only",             # lone lang: no pair
        ]
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        return bitext_url_pairs(df)

    def test_pairs(self, pairs_df):
        got = {
            (r.stem, r.src_lang, r.tgt_lang): (r.src_url, r.tgt_url)
            for r in pairs_df.collect()
        }
        s1 = "https://w.s1.example/{lang}/p1"
        assert got[(s1, "de", "en")] == (
            "https://w.s1.example/de-DE/p1", "https://w.s1.example/en/p1"
        )
        assert (s1, "de", "fr") in got and (s1, "en", "fr") in got
        # min-url representative: the query variant loses to the bare URL
        assert got[(s1, "en", "fr")][0] == "https://w.s1.example/en/p1"
        assert got[(
            "https://{lang}.h2.example/p/2", "es", "pt"
        )] == ("https://es.h2.example/p/2", "https://pt.h2.example/p/2")
        assert len(got) == 4  # lone-lang and no-marker URLs never pair

    def test_plan_two_keyed_aggs_no_python_no_join(self, pairs_df):
        plan = pairs_df._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert final.count("Exchange") == 2, final
        assert "EvalPython" not in final, final
        assert "Join" not in final, final   # pair expansion is JVM arrays
