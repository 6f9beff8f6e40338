"""Citation extraction — series precedence, boundaries, plan shape."""

import pytest
from pyspark.sql import functions as F

from doctor_spark.functions.citations import (
    CITATION_PATTERN,
    REPORTERS,
    citation_count,
    citation_spans,
)
from doctor_spark.plans.checks import (
    assert_jvm_only,
    count_exchanges,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "Roe v. Wade, 410 U.S. 113, and later 505 U.S. 833."),
            (2, "See 100 F. Supp. 2d 999 and 50 F. Supp. 3 and 7 F. 44"),
            (3, "no citations"),
            (4, "123 S. Ct. 4567 then 9 L. Ed. 2d 10 then 1 L. Ed. 2"),
            (5, None),
        ],
        "doc_id long, text string",
    )


def test_basic_extraction(spark, corpus):
    out = citation_spans(corpus)
    rows = {(r.doc_id, r.cite_idx): r for r in out.collect()}
    r = rows[(1, 0)]
    assert (r.volume, r.reporter, r.page) == (410, "U.S.", 113)
    r = rows[(1, 1)]
    assert (r.volume, r.reporter, r.page) == (505, "U.S.", 833)


def test_series_precedence(spark, corpus):
    out = citation_spans(corpus)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    d2 = sorted(by_doc[2], key=lambda r: r.cite_idx)
    # longest series wins; the bare "F. Supp." and "F." still match
    assert [(r.reporter, r.volume, r.page) for r in d2] == [
        ("F. Supp. 2d", 100, 999),
        ("F. Supp.", 50, 3),
        ("F.", 7, 44),
    ]
    d4 = sorted(by_doc[4], key=lambda r: r.cite_idx)
    assert [r.reporter for r in d4] == ["S. Ct.", "L. Ed. 2d", "L. Ed."]


def test_boundaries(spark):
    d = spark.createDataFrame(
        [
            (1, "x1410 U.S. 113"),      # volume glued to a word: no match
            (2, "410 U.S. 113a"),       # page glued to a letter: no match
            (3, "(410 U.S. 113)"),      # parens are fine
        ],
        "doc_id long, text string",
    )
    out = citation_spans(d).collect()
    assert {r.doc_id for r in out} == {3}


def test_no_citations_and_null(spark, corpus):
    out = citation_spans(corpus)
    assert out.where(F.col("doc_id").isin(3, 5)).count() == 0


def test_citation_count_matches_spans(spark, corpus):
    n_spans = citation_spans(corpus).count()
    total = (
        corpus.where(F.col("text").isNotNull())
        .select(F.sum(citation_count(F.col("text"))).alias("n"))
        .collect()[0]["n"]
    )
    assert total == n_spans


def test_inventory_order_longest_prefix_first():
    for i, a in enumerate(REPORTERS):
        for b in REPORTERS[i + 1:]:
            # a shorter series listed first would shadow its extensions
            assert not b.startswith(a) or a == b, (
                f"{a!r} is a prefix of {b!r} but ordered before it"
            )
    # and the converse ordering is present where it matters
    assert REPORTERS.index("F. Supp. 2d") < REPORTERS.index("F. Supp.")
    assert REPORTERS.index("F. Supp.") < REPORTERS.index("F.")
    assert CITATION_PATTERN.startswith(r"\b(\d{1,4}) (")


def test_map_only_plan(spark, corpus):
    out = citation_spans(corpus)
    assert_jvm_only(out)
    assert count_exchanges(out) == 0
