"""Host-disjoint train/validation/test splitting — the leakage gate a
training-data pipeline runs before any eval is trustworthy: near-
duplicate pages live on the SAME site (templates, syndication, CMS
re-renders), so a page-level random split leaks train content into
test.  The standard fix is splitting by REGISTRABLE DOMAIN — every
page of a site lands in exactly one split, by construction.

Determinism discipline (operators/sampling.py): the split decision is
``md5(salt || domain)``'s first 4 hex chars compared against ratio
boundaries — reproducible on any cluster size, any engine with md5,
any retry; no RNG anywhere.  The registrable domain is an eTLD+1
approximation: last two labels, or last three when the two-label tail
is a known second-level registry suffix (co.uk and friends) — the full
Public Suffix List drops in as data without changing the shape.

Everything is pure Column expressions — whole-stage codegen, ZERO
shuffles for the assignment itself (split 10^12 rows as a map over the
scan); only the verification rollup aggregates, keyed on (split,
domain) with map-side combine absorbing the per-site fan-in.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

BUCKETS = 65_536

# second-level registry suffixes where the registrable domain is three
# labels (the high-traffic subset; extend with the PSL for production)
SECOND_LEVEL_TLDS = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp",
    "com.au", "net.au", "org.au", "com.br", "co.in", "co.nz",
    "com.mx", "com.cn", "com.sg", "com.tr",
)


def registrable_domain(host: Column) -> Column:
    """eTLD+1 approximation of ``host`` (lowercased)."""
    h = F.lower(host)
    two = F.regexp_extract(h, r"([^.]+\.[^.]+)$", 1)
    three = F.regexp_extract(h, r"([^.]+\.[^.]+\.[^.]+)$", 1)
    return (
        F.when(
            (three != "") & two.isin(*SECOND_LEVEL_TLDS), three
        )
        .when(two != "", two)
        .otherwise(h)
    )


def split_boundaries(ratios: tuple[float, float, float]) -> tuple[str, str]:
    """(train_hi, val_hi) as 4-hex-char bucket bounds."""
    train, val, test = ratios
    assert abs(train + val + test - 1.0) < 1e-9
    return (
        f"{int(train * BUCKETS):04x}",
        f"{int((train + val) * BUCKETS):04x}",
    )


def assign_split(
    df: DataFrame,
    host_col: str = "host",
    salt: str = "split",
    ratios: tuple[float, float, float] = (0.8, 0.1, 0.1),
) -> DataFrame:
    """Adds (domain, split) — split in {'train','val','test'}, constant
    per registrable domain.  Pure projection: zero shuffles."""
    train_hi, val_hi = split_boundaries(ratios)
    domain = registrable_domain(F.col(host_col))
    bucket = F.substring(F.md5(F.concat(F.lit(salt), domain)), 1, 4)
    return df.withColumn("domain", domain).withColumn(
        "split",
        F.when(bucket < F.lit(train_hi), "train")
        .when(bucket < F.lit(val_hi), "val")
        .otherwise("test"),
    )


def split_summary(assigned: DataFrame) -> DataFrame:
    """(split, n_pages, n_domains) — the ratio/leakage audit table.
    Two-level aggregate: (split, domain) pre-combine first so hot
    sites collapse map-side before the split-level rollup."""
    per_domain = assigned.groupBy("split", "domain").agg(
        F.count("*").alias("n_pages")
    )
    return per_domain.groupBy("split").agg(
        F.sum("n_pages").alias("n_pages"),
        F.count("*").alias("n_domains"),
    )


def cross_split_leakage(
    pairs: DataFrame,
    assign: DataFrame,
    id_col: str = "id",
    part_col: str = "part",
) -> DataFrame:
    """Leakage audit for ANY partitioning: given near-duplicate pairs
    (id_a, id_b) and a per-document partition assignment, count how
    many pairs CROSS partitions — each crossing pair is an eval-set
    contamination path (test doc nearly identical to a train doc).
    Host-disjoint splits drive this to zero by construction; temporal
    cutoffs (train on the past, eval on the future) do NOT, because
    re-crawls and syndication duplicate content across time — this
    audit is how a pipeline measures that residual risk.

    One row: (n_pairs, n_cross, leak_micro) with leak_micro the
    crossing fraction in int64 micro (0 when there are no pairs).
    Two keyed equi-joins (pairs are sketch-output-sized; AQE
    broadcasts the assignment when small) + ONE scalar aggregate."""
    a = assign.select(
        F.col(id_col).alias("id_a"), F.col(part_col).alias("__pa")
    )
    b = assign.select(
        F.col(id_col).alias("id_b"), F.col(part_col).alias("__pb")
    )
    j = pairs.join(a, "id_a").join(b, "id_b")
    return j.agg(
        F.count("*").alias("n_pairs"),
        F.sum(
            (F.col("__pa") != F.col("__pb")).cast("long")
        ).alias("n_cross"),
    ).select(
        F.col("n_pairs").cast("bigint"),
        F.coalesce(F.col("n_cross"), F.lit(0)).cast("bigint")
        .alias("n_cross"),
        F.when(F.col("n_pairs") == 0, F.lit(0))
        .otherwise(
            F.expr("(coalesce(n_cross, 0) * 1000000) div n_pairs")
        ).cast("bigint").alias("leak_micro"),
    )
