"""Host-level quality rollup gate — drop whole sites, not just pages.

Page-level quality gates (Gopher, C4) treat every document alone, but
web junk clusters by SITE: a spam farm, a scraped-content mirror, or a
parked domain fails the page gates on MOST of its pages, and the
remaining "passing" pages from such hosts are disproportionately junk
the page-level rules missed.  RefinedWeb/FineWeb handle this with
URL/host-level curation before content filtering; this operator is the
content-informed version a 10^12-row corpus can compute for itself:

1. per-document verdict (the existing Gopher composite — pure Column
   expressions, zero Python);
2. ONE keyed aggregate per host: ``n_docs``, ``n_fail`` (map-side
   combinable counts);
3. host verdict: a host is kept when it is too small to judge
   (``n_docs < min_docs`` — benefit of the doubt) or its fail
   fraction is at most ``max_fail_pct`` — evaluated as the integer
   predicate ``n_fail * 100 <= n_docs * max_fail_pct`` so Spark and
   the DuckDB oracle agree bit-for-bit with no float division;
4. verdict joined back to the documents (keyed equi-join — the host
   dimension of a 10^12-page crawl is ~10^8-10^9 rows, far beyond
   broadcast; AQE skew-splits a mega-host's join side).

No reference counterpart: doctor extracts single documents
(tasks.py:75-89); corpus-level curation is this repo's extension
surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.text import gopher_passes


def host_quality_rollup(
    docs: DataFrame,
    host_col: str = "host",
    passes: Column | None = None,
    text_col: str = "text",
    min_docs: int = 5,
    max_fail_pct: int = 50,
) -> DataFrame:
    """Per-host quality table: ``(host, n_docs, n_fail, host_ok)``.

    ``passes`` defaults to :func:`..functions.text.gopher_passes` on
    ``text_col``; pass any boolean Column to roll up a different
    page-level gate.  Exactly ONE row-volume exchange (the host
    aggregate, map-side partial counts)."""
    if passes is None:
        passes = gopher_passes(F.col(text_col))
    per_doc = docs.select(
        F.col(host_col).alias("host"),
        (~passes).cast("int").alias("_fail"),
    )
    agg = per_doc.groupBy("host").agg(
        F.count("*").alias("n_docs"),
        F.sum("_fail").alias("n_fail"),
    )
    host_ok = (F.col("n_docs") < F.lit(min_docs)) | (
        F.col("n_fail") * 100 <= F.col("n_docs") * F.lit(max_fail_pct)
    )
    return agg.select(
        "host", "n_docs", "n_fail", host_ok.alias("host_ok")
    )


def host_quality_gate(
    docs: DataFrame,
    host_col: str = "host",
    passes: Column | None = None,
    text_col: str = "text",
    min_docs: int = 5,
    max_fail_pct: int = 50,
) -> DataFrame:
    """The documents with ``passes`` (this page's own verdict) and
    ``host_ok`` (its site's rollup verdict) appended — mark-not-filter,
    like every gate in this repo, so downstream stages choose the
    policy (``WHERE host_ok AND passes`` for training data; ``WHERE
    NOT host_ok`` for a spam-farm audit).

    Plan: the rollup's single host aggregate + ONE keyed join back on
    the host.  The join is deliberately NOT a broadcast: at crawl
    scale the host dimension alone exceeds executor memory; AQE
    handles the mega-host skew."""
    if passes is None:
        passes = gopher_passes(F.col(text_col))
    rollup = host_quality_rollup(
        docs, host_col=host_col, passes=passes, text_col=text_col,
        min_docs=min_docs, max_fail_pct=max_fail_pct,
    ).select("host", "host_ok")
    marked = docs.withColumn("passes", passes)
    return marked.join(
        rollup, marked[host_col] == rollup["host"], "left"
    ).drop(rollup["host"]).withColumn(
        "host_ok", F.coalesce(F.col("host_ok"), F.lit(True))
    )
