"""RAKE keywords — spec arithmetic, caps, operator plan."""

import pytest
from pyspark.sql import functions as F

from doctor_spark.kernels.rake import rake_keywords
from doctor_spark.operators.rake import rake_table
from doctor_spark.plans.checks import count_exchanges, physical_plan


class TestKernel:
    def test_paper_style_arithmetic(self):
        # freq: deep 3, learning 2, networks 1, wins 1
        # deg:  deep 7, learning 5, networks 2, wins 3
        out = rake_keywords(
            "deep learning of deep networks, deep learning wins"
        )
        assert out == [
            ("deep learning wins", 7_833_333, 3, 1),
            ("deep learning", 4_833_333, 2, 1),
            ("deep networks", 4_333_333, 2, 1),
        ]

    def test_max_phrase_splits_runs(self):
        out = rake_keywords(
            "the quick brown fox jumps over a lazy dog", max_phrase=3
        )
        # 8-word content run splits 3+3+2; 9e6 tie broken by phrase asc
        assert [p for p, *_ in out] == [
            "jumps over a", "quick brown fox", "lazy dog"
        ]
        assert out[0][1] == out[1][1] == 9_000_000

    def test_stopwords_and_nonalpha_break(self):
        out = rake_keywords("stop the of and to in")
        assert out == [("stop", 1_000_000, 1, 1)]
        assert rake_keywords("a1b c2d 42") == []
        assert rake_keywords("") == [] and rake_keywords(None) == []

    def test_repeated_phrase_scored_once_counted(self):
        out = rake_keywords("green tea. green tea. green tea")
        assert out == [("green tea", 4_000_000, 2, 3)]

    def test_top_k(self):
        text = ", ".join(f"word{c}" for c in "abcdefghij")
        # 'wordX' contains digits? no — letters only
        out = rake_keywords(text, top_k=4)
        assert len(out) == 4


class TestOperator:
    def test_explode_and_rank(self, spark):
        d = spark.createDataFrame(
            [(1, "deep learning of deep networks, deep learning wins"),
             (2, None)],
            "doc_id long, text string",
        )
        out = rake_table(d, top_k=5, max_phrase=4)
        rows = out.orderBy("kw_rank").collect()
        assert [r.kw_rank for r in rows] == [0, 1, 2]
        assert rows[0].phrase == "deep learning wins"
        assert rows[0].score_micro == 7_833_333

    def test_map_only_plan(self, spark):
        d = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
        out = rake_table(d)
        assert count_exchanges(out) == 0
        assert "ArrowEvalPython" in physical_plan(out, "simple") or \
            "EvalPython" in physical_plan(out, "simple")
