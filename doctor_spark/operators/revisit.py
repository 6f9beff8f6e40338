"""Capture-level payload dedup — WARC revisit assignment.

The fetch-time half of corpus dedup: when a crawler captures a payload
whose digest it has stored before, it writes a *revisit* record
pointing at the original capture instead of re-storing the bytes
(WARC 1.1 §6.7.2; Common Crawl does exactly this).  Batch-side, the
same assignment turns a pile of captures into (original, revisits)
per digest — the input both the CDX index and storage accounting want.

The original of a digest is the earliest capture, ties broken by URL —
i.e. ``min(struct(date, url))``.  Dates are fixed-format ISO-8601
STRINGS (the repo's WET/WAT convention), so lexicographic order IS
chronological order and the pick replays exactly in any engine.

Scale shape: NOT a window over digest (a hot digest — the empty page,
a 404 template — would pull its every capture into one partition).
Instead ONE map-side-combined ``min`` aggregation per digest (hot keys
partially aggregated on the map side, skew never lands on one reducer)
plus ONE keyed join back.  Two exchanges total, both digest-keyed, the
second reusable by any downstream digest-keyed stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def revisit_assign(
    captures: DataFrame,
    url_col: str = "url",
    date_col: str = "date_s",
    text_col: str = "text",
) -> DataFrame:
    """``(url, date_s, digest, is_revisit, refers_url, refers_date)``
    — one row per capture; ``refers_*`` are NULL on originals."""
    base = captures.where(F.col(text_col).isNotNull()).select(
        F.col(url_col).alias("url"),
        F.col(date_col).alias("date_s"),
        F.md5(F.col(text_col)).alias("digest"),
    )
    originals = base.groupBy("digest").agg(
        F.min(F.struct("date_s", "url")).alias("o")
    )
    joined = base.join(originals, "digest")
    is_rev = (F.col("date_s") != F.col("o.date_s")) | (
        F.col("url") != F.col("o.url")
    )
    return joined.select(
        "url",
        "date_s",
        "digest",
        is_rev.alias("is_revisit"),
        F.when(is_rev, F.col("o.url")).alias("refers_url"),
        F.when(is_rev, F.col("o.date_s")).alias("refers_date"),
    )


def revisit_records(assigned: DataFrame) -> DataFrame:
    """Attach the complete revisit-record bytes (NULL on originals):
    adds ``record`` BINARY — pure codegen over :func:`revisit_assign`
    output, zero additional shuffles."""
    from doctor_spark.sources.warc import revisit_record

    rec = revisit_record(
        F.col("url"),
        F.col("date_s"),
        F.col("digest"),
        F.col("refers_url"),
        F.col("refers_date"),
    )
    return assigned.withColumn(
        "record", F.when(F.col("is_revisit"), rec)
    )
