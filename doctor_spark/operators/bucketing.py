"""Bucketed-table co-location for repeated large joins.

At 100 TB the dominant cost of iterative dedup / enrichment passes over the
same corpus is re-shuffling it on the join key every run.  Hive-style
bucketing fixes the physical layout once at write time: a table written
with ``bucketBy(n, key)`` (+ optional ``sortBy``) can be joined or
aggregated on that key with NO exchange — Catalyst matches the two sides'
``HashPartitioning(key, n)`` output partitioning and plans a sort-merge
join straight over the bucket files.

Spark specifics encoded here:

- bucketing metadata lives in the session catalog (``saveAsTable``; a
  plain ``.parquet(path)`` write cannot carry it).  With the default
  in-memory catalog the table registration is session-scoped while the
  files persist; production deployments point
  ``spark.sql.warehouse.dir``/metastore at durable storage.
- both join sides must have the same bucket count (or a multiple, with
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``).
- ``sortBy`` on the join key additionally removes the per-task Sort from
  the merge join.

The shuffle-free shape is asserted by tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 64,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a parquet table bucketed (and optionally sorted)
    on ``bucket_cols`` — co-locates every future join/agg on those keys."""
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its bucket spec intact (must go
    through the catalog — ``spark.read.parquet`` on the files would drop
    the bucketing metadata and reintroduce the shuffle)."""
    return spark.table(table)
