"""Sentence-segmentation spec tests: every rule in kernels/sentences.py
pinned with literal expected splits, plus the map-only plan contract of
the sentence_stats driver query."""

import pytest

from doctor_spark.kernels.sentences import (
    sentence_stats_row,
    split_sentences,
)

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize(
    "text,expected",
    [
        # abbreviation guard: Dr./Mr. periods never split
        ("Dr. Smith saw Mr. Jones.", ["Dr. Smith saw Mr. Jones."]),
        # decimals never split (boundary needs whitespace after the run)
        ("The rate is 3.14 now.", ["The rate is 3.14 now."]),
        # multi-char terminal runs split; the guard is period-only
        ("Really?! Yes.", ["Really?!", "Yes."]),
        # closing quote rides with the terminal; 'counsel' is no abbrev
        (
            'He said "Stop right there, counsel." Then he left.',
            ['He said "Stop right there, counsel."', "Then he left."],
        ),
        # Fig. guarded even before a digit opener; real boundary after
        (
            "See Fig. 3 for details. It grows.",
            ["See Fig. 3 for details.", "It grows."],
        ),
        # dotted abbreviations compare with internal dots kept
        ("Use e.g. Spark here. Fine.", ["Use e.g. Spark here.", "Fine."]),
        # lowercase opener: not a boundary
        ("end. of story", ["end. of story"]),
        # no terminal at all: one trailing sentence
        ("Hello world", ["Hello world"]),
        # ellipsis run splits when an opener follows
        ("Wait... Then go.", ["Wait...", "Then go."]),
        # opening bracket stripped before the guard lookup
        ("(Dr. Who) arrived. Next.", ["(Dr. Who) arrived.", "Next."]),
    ],
)
def test_split_spec(text, expected):
    assert split_sentences(text) == expected


def test_split_null_empty_and_stats():
    assert split_sentences(None) == []
    assert split_sentences("   ") == []
    assert sentence_stats_row(None) == (0, 0, 0)
    assert sentence_stats_row("Really?! Yes.") == (2, 12, 8)


def test_composition_is_additive():
    """Joining terminal-ended pieces with a space splits exactly into
    the concatenation of per-piece splits — the property the driver
    oracle's CASE arithmetic relies on."""
    a, c = "Dr. Smith saw Mr. Jones.", "Really?! Yes."
    assert split_sentences(f"{a} {c}") == split_sentences(
        a
    ) + split_sentences(c)


def test_sentence_stats_plan_map_only(spark):
    from pyspark.sql import functions as F

    from doctor_spark.functions.text import sentence_stats_udf

    df = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.col("doc_id"),
        sentence_stats_udf()(F.col("text")).alias("s"),
    ).select("doc_id", "s.n_sentences")
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "Exchange" not in final, final
    assert final.count("ArrowEvalPython") == 1, final
