"""Legal citation extraction — volume/reporter/page cites from text.

The reference engine (freelawproject/doctor) exists to feed
CourtListener: the single most important downstream consumer of its
extracted text is citation analysis (Free Law Project's eyecite).  This
module implements the deterministic core of that pass — the
``<volume> <reporter> <page>`` cite (``410 U.S. 113``) over an explicit
reporter-abbreviation inventory — as pure Column expressions.

Patterns live in the Java∩RE2 subset (no lookaround, no
backreferences; ``\\b`` is the ASCII word boundary in both), spaces are
literal single spaces (court citations are single-spaced; the
Java-vs-RE2 ``\\s`` unicode divergence never enters), and the reporter
alternation is ordered longest-prefix-first so Java's and RE2's shared
leftmost-FIRST alternation semantics pick the same series
(``F. Supp. 2d`` before ``F. Supp.`` before ``F.``).

Scale shape: ``regexp_extract_all`` + per-match group extraction inside
a row-local ``posexplode`` — map-only, whole-stage codegen, zero
Python, output bounded by citation count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Longest-prefix-first: any series that is a textual prefix of another
# must come AFTER it (F. Supp. 2d < F. Supp. < F.; L. Ed. 2d < L. Ed.).
REPORTERS: tuple[str, ...] = (
    "U.S.",
    "S. Ct.",
    "L. Ed. 2d",
    "L. Ed.",
    "F. Supp. 3d",
    "F. Supp. 2d",
    "F. Supp.",
    "F.4th",
    "F.3d",
    "F.2d",
    "F.",
    "So. 3d",
    "So. 2d",
    "P.3d",
    "P.2d",
    "A.3d",
    "A.2d",
    "N.E.3d",
    "N.E.2d",
    "N.W.2d",
    "S.E.2d",
    "S.W.3d",
    "S.W.2d",
    "Cal. Rptr. 3d",
    "B.R.",
    "Fed. Cl.",
    "WL",
)

_ALT = "|".join(r.replace(".", "\\.") for r in REPORTERS)

#: The full-cite pattern; groups: 1 = volume, 2 = reporter, 3 = page.
CITATION_PATTERN: str = rf"\b(\d{{1,4}}) ({_ALT}) (\d{{1,5}})\b"


def citation_spans(
    docs: DataFrame,
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(doc_id, cite_idx, volume, reporter, page)`` — one row per
    citation match in document order; ``cite_idx`` 0-based."""
    base = docs.where(F.col(text_col).isNotNull())
    hits = base.select(
        F.col(doc_col).alias("doc_id"),
        F.posexplode(
            F.regexp_extract_all(
                F.col(text_col), F.lit(CITATION_PATTERN), F.lit(0)
            )
        ).alias("cite_idx", "cite"),
    )
    pat = F.lit(CITATION_PATTERN)
    return hits.select(
        "doc_id",
        F.col("cite_idx").cast("int").alias("cite_idx"),
        F.regexp_extract("cite", CITATION_PATTERN, 1)
        .cast("bigint")
        .alias("volume"),
        F.regexp_extract("cite", CITATION_PATTERN, 2).alias("reporter"),
        F.regexp_extract("cite", CITATION_PATTERN, 3)
        .cast("bigint")
        .alias("page"),
    )


def citation_count(col: Column) -> Column:
    """Number of citation matches in ``col`` (codegen'd, zero Python)."""
    return F.regexp_count(col, F.lit(CITATION_PATTERN))
