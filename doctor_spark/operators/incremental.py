"""Incremental crawl processing: snapshot-over-snapshot diff.

A recurring crawl produces snapshot tables; the pipeline wants to
process only what changed (CDX-style): rows NEW in this snapshot,
rows whose content CHANGED, rows GONE since last time, and the
unchanged bulk to skip.  One full-outer keyed join on the row key with
fingerprint comparison — the shuffle is on the key both sides, AQE
skew-splittable, and at 10^12 rows this is the cheapest possible exact
diff (no text ever crosses the wire, only fingerprints).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import fingerprint


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Returns one row per key present in either snapshot:
    ``(key_col, status, old_fp, new_fp)`` with status ∈
    {'new', 'gone', 'changed', 'same'}.  Content comparison is by
    :func:`fingerprint` (md5 of normalized text), so only 32-byte
    digests shuffle — never the documents.  NULL text fingerprints as
    the empty document (a key present with no content is still present)."""
    o = old.select(
        F.col(key_col).alias("k"),
        fingerprint(F.coalesce(F.col(text_col), F.lit(""))).alias("old_fp"),
    )
    n = new.select(
        F.col(key_col).alias("k"),
        fingerprint(F.coalesce(F.col(text_col), F.lit(""))).alias("new_fp"),
    )
    joined = o.join(n, "k", "full_outer")
    status = (
        F.when(F.col("old_fp").isNull(), F.lit("new"))
        .when(F.col("new_fp").isNull(), F.lit("gone"))
        .when(F.col("old_fp") == F.col("new_fp"), F.lit("same"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        F.col("k").alias(key_col), status.alias("status"), "old_fp", "new_fp"
    )
