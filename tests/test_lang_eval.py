"""Quality evaluation for the 27-language `lang_guess` (round-4 verdict
item 8 — this is an ACCURACY eval on labeled text, distinct from the
oracle-exactness gates in CORRECTNESS).

Fixture: tests/fixtures/lang_samples.tsv — three labeled sentences per
language: UDHR Article 1 (public domain), a news/legal-register
sentence, and a shorter harder sentence.  Covers all 18 Latin stopword
inventories and all 9 script-routed languages.

Known failure modes (documented in COVERAGE.md): the da/no/sv continuum
shares most function words, so short Danish/Norwegian sentences can swap;
pl/cs share `się/se`-family tokens.  The gate is overall accuracy ≥ 90%
plus 100% on script-routed languages (those are deterministic range
counts, not statistics).
"""

from __future__ import annotations

import csv
from collections import Counter
from pathlib import Path

import pytest

from doctor_spark.functions import text as T

FIXTURE = Path(__file__).parent / "fixtures" / "lang_samples.tsv"

SCRIPT_LANGS = {"zh", "ja", "ko", "ar", "ru", "el", "he", "th", "hi"}


def _samples():
    with open(FIXTURE, encoding="utf-8") as f:
        return [(r["lang"], r["text"]) for r in csv.DictReader(f, delimiter="\t")]


@pytest.fixture(scope="module")
def predictions(spark):
    from pyspark.sql import functions as F

    rows = _samples()
    df = spark.createDataFrame(rows, "lang string, text string")
    got = (
        df.withColumn("guess", T.lang_guess(F.col("text")))
        .select("lang", "guess", "text")
        .collect()
    )
    return [(r["lang"], r["guess"], r["text"]) for r in got]


class TestLangIdQuality:
    def test_overall_accuracy_ge_90(self, predictions):
        correct = sum(1 for lang, guess, _t in predictions if lang == guess)
        acc = correct / len(predictions)
        confusions = Counter(
            (lang, guess) for lang, guess, _t in predictions if lang != guess
        )
        assert acc >= 0.90, (
            f"accuracy {acc:.3f} ({correct}/{len(predictions)}); "
            f"confusions: {dict(confusions)}"
        )

    def test_script_routed_languages_exact(self, predictions):
        wrong = [
            (lang, guess, t)
            for lang, guess, t in predictions
            if lang in SCRIPT_LANGS and guess != lang
        ]
        assert wrong == [], wrong

    def test_udhr_sentences_all_correct(self, predictions):
        # sample 0 per language is UDHR Article 1 — the longest, most
        # stopword-dense sentence; all 27 must be exact EXCEPT the
        # Bokmål/Danish continuum: the Norwegian UDHR's function words
        # (og/er/med/frie/samme) are character-identical in Danish, so
        # the argmax ties and dict order picks da.  A stopword model
        # cannot separate these two orthographies on this sentence;
        # documented in COVERAGE.md as the known failure mode.
        firsts: dict[str, tuple[str, str]] = {}
        for lang, guess, t in predictions:
            firsts.setdefault(lang, (guess, t))
        wrong = {lg: g for lg, (g, _t) in firsts.items() if g != lg}
        assert wrong in ({}, {"no": "da"}), wrong

    def test_fixture_covers_all_27(self):
        langs = {lang for lang, _t in _samples()}
        assert langs == set(T.LANG_STOPWORDS) | SCRIPT_LANGS
        assert len(langs) == 27
