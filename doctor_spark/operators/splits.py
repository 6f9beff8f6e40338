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
