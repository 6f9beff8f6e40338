"""Classify + skew-bucketing stage (pre-extraction).

Cheap, JVM-side column derivations (no Python):

- ``url_ext``     — filename-suffix extension (reference forms.py:24-31),
  a single ``regexp_extract`` that whole-stage-codegens;
- ``size_bytes`` / ``size_bucket`` — payload-size skew classes; large
  documents are isolated so one giant PDF cannot straggle a partition of
  small HTML pages (north_star: "large PDFs isolated into skew buckets");
- ``salt``        — deterministic hash salt so repartitioning by
  (size_bucket, salt) spreads each bucket across the cluster.

Content-based mime sniffing deliberately does NOT happen here: it would
ship every payload through Arrow once just to read 8 magic bytes.  The
extract UDF classifies per batch instead (classify-then-parse inside one
Python pass — SURVEY.md §2.2 C1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# size-bucket boundaries (bytes): small HTML/txt, medium, large, giant
SIZE_BOUNDARIES = (32_768, 262_144, 2_097_152)
# distinct (size_bucket, salt) keys must be >> the partition count, or
# balls-in-bins variance leaves partitions 3-4× imbalanced (observed: 64
# salts → 44 non-empty partitions of 96, max/min doc ratio 4.4)
DEFAULT_SALTS = 4096

_EXT_PATTERN = r"\.([A-Za-z0-9]{1,5})(?:[?#].*)?$"


def with_classification(df: DataFrame, n_salts: int = DEFAULT_SALTS) -> DataFrame:
    s, m, l = SIZE_BOUNDARIES
    return (
        df.withColumn(
            "url_ext", F.lower(F.regexp_extract(F.col("url"), _EXT_PATTERN, 1))
        )
        .withColumn("size_bytes", F.length(F.col("html")))
        .withColumn(
            "size_bucket",
            F.when(F.col("size_bytes") < s, F.lit("s"))
            .when(F.col("size_bytes") < m, F.lit("m"))
            .when(F.col("size_bytes") < l, F.lit("l"))
            .otherwise(F.lit("xl")),
        )
        .withColumn("salt", F.pmod(F.xxhash64(F.col("url")), F.lit(n_salts)))
    )


def skew_repartition(df: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Salted, size-bucketed repartition: documents of similar cost land
    together, each bucket spread over ``n_salts`` partitions.  AQE splits
    any residual skew at runtime.

    The partition count is always explicit: extraction is CPU-bound Python,
    so AQE's byte-based partition coalescing (advisory 64 MB) would collapse
    small-byte/high-cost batches onto too few cores — observed locally as a
    300-doc corpus landing in ONE task.  We want one partition per task slot
    times a small over-decomposition factor for stragglers."""
    if num_partitions is None:
        sc = df.sparkSession.sparkContext
        num_partitions = max(sc.defaultParallelism * 3, 8)
    return df.repartition(num_partitions, F.col("size_bucket"), F.col("salt"))
