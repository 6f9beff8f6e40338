"""Readability metrics — the spec'd syllable/sentence rules and the
FK/Flesch arithmetic, plus a pure-Python differential on hostile text."""

import re

import pytest
from pyspark.sql import functions as F

from doctor_spark.functions.text import (
    SENTENCE_RUN_RE,
    VOWEL_GROUP_RE,
    readability_metrics,
    sentence_run_count,
    syllable_count,
)
from doctor_spark.plans.checks import assert_jvm_only, count_exchanges


def _row(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    m = readability_metrics(F.col("text"))
    return df.select(*(v.alias(k) for k, v in m.items())).collect()[0]


def _py_metrics(text):
    toks = re.split(r"\s+", text.strip().lower()) if text.strip() else []
    w = len(toks)
    s = max(1, len(re.findall(r"[.!?]+", text))) if w else 0
    y = sum(max(1, len(re.findall(r"[aeiouy]+", t))) for t in toks)
    if w == 0:
        return w, s, y, None, None
    fk = round(0.39 * (w / s) + 11.8 * (y / w) - 15.59, 4)
    ease = round(206.835 - 1.015 * (w / s) - 84.6 * (y / w), 4)
    return w, s, y, fk, ease


def test_known_sentence(spark):
    r = _row(spark, "The cat sat.")
    assert (r.n_words, r.n_sentences, r.n_syllables) == (3, 1, 3)
    assert r.fk_grade == round(0.39 * 3 + 11.8 * 1 - 15.59, 4)


def test_blank_text_nulls(spark):
    r = _row(spark, "   ")
    assert (r.n_words, r.n_sentences, r.n_syllables) == (0, 0, 0)
    assert r.fk_grade is None and r.flesch_ease is None


def test_vowel_group_spec(spark):
    # "queueing" = 2 groups (ueuei + g? no: 'ueuei' is one run... spec
    # says runs of [aeiouy]): q-ueuei-ng -> 1 run; "rhythm" has y -> 1;
    # "xyzzy" has y twice separated -> 2; "123" has none -> clamped 1
    df = spark.createDataFrame(
        [("queueing rhythm xyzzy 123",)], "text string"
    )
    out = df.select(syllable_count(F.col("text")).alias("y")).collect()[0]
    assert out.y == 1 + 1 + 2 + 1


def test_sentence_runs(spark):
    df = spark.createDataFrame(
        [("One. Two?! Three... no terminal",)], "text string"
    )
    out = df.select(
        sentence_run_count(F.col("text")).alias("s")
    ).collect()[0]
    assert out.s == 3  # '.', '?!', '...' are three runs


def test_no_terminal_run_clamps_to_one(spark):
    r = _row(spark, "no punctuation here at all")
    assert r.n_sentences == 1


@pytest.mark.parametrize("text", [
    "Mr. Smith went to Washington. He left at 3.5 p.m.!",
    "word " * 200 + "End.",
    "!!!",
    "a.b.c.d",
    "Ünïcödé vowels are not [aeiouy] — cafe café",
    "tab\tseparated\nnewlines\r\nand   runs",
])
def test_differential_vs_python(spark, text):
    r = _row(spark, text)
    w, s, y, fk, ease = _py_metrics(text)
    assert (r.n_words, r.n_sentences, r.n_syllables) == (w, s, y)
    if fk is None:
        assert r.fk_grade is None
    else:
        assert abs(r.fk_grade - fk) < 1e-9
        assert abs(r.flesch_ease - ease) < 1e-9


def test_map_only_jvm_plan(spark):
    df = spark.createDataFrame([("x.",)], "text string")
    m = readability_metrics(F.col("text"))
    out = df.select(*(v.alias(k) for k, v in m.items()))
    assert_jvm_only(out)
    assert count_exchanges(out) == 0
