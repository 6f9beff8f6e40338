"""Deterministic corpus sampling / mixing for training-data pipelines.

Training-data recipes sample and re-weight sources ("2 epochs of
wikipedia, 0.3 of common crawl").  ``DataFrame.sample`` is RNG-backed:
results change across runs, engines, retries, and partition layouts —
poison for resumable 10^12-row jobs and impossible to oracle-check.

``hash_sample`` keys the decision on the row itself: keep a row iff the
first 4 hex chars of ``md5(salt || key)`` sort below the rate threshold.
65,536 uniform buckets, reproducible everywhere (same rows survive on
any cluster size, any engine with md5, any retry), lexicographic hex
comparison so the SQL mirror is a plain string predicate.  Changing
``salt`` draws an independent sample — disjoint-ish samples for
train/validation splits come from disjoint rate windows instead
(``band=(lo, hi)``).

Pure Column expressions: whole-stage codegen, zero shuffles — sampling
10^12 rows is a map over the scan with the filter pushed tight against it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

BUCKETS = 65_536  # 4 hex chars


def sample_bucket(key: Column, salt: str = "") -> Column:
    """The row's 4-hex-char md5 bucket (as the hex string, '0000'-'ffff')."""
    return F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 4)


def hash_sample(
    df: DataFrame,
    key_col: str = "url",
    rate: float = 0.1,
    salt: str = "",
    band: tuple[float, float] | None = None,
) -> DataFrame:
    """Deterministic sample of ~``rate`` of the rows (or the rows whose
    bucket falls in ``band = (lo, hi)`` fractions, for carving disjoint
    train/validation splits from one hashing)."""
    lo, hi = band if band is not None else (0.0, rate)
    lo_i, hi_i = int(lo * BUCKETS), int(hi * BUCKETS)
    b = sample_bucket(F.col(key_col), salt)
    cond = b >= F.lit(f"{lo_i:04x}")
    if hi_i < BUCKETS:
        # hi = 1.0 would format as the 5-char '10000', which sorts BELOW
        # every 4-char bucket lexicographically and selected nothing; the
        # top band simply has no upper bound
        cond = cond & (b < F.lit(f"{hi_i:04x}"))
    return df.where(cond)


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    quota: int,
    key_col: str = "doc_id",
    salt: str = "",
    prefilter_rate: float | None = None,
) -> DataFrame:
    """Deterministic quota sampling per stratum — the training-mix
    builder's "N documents per (source, language)" primitive.  Rows rank
    within their stratum by ``(md5(salt || key), key)`` (the same
    engine-portable ordering :func:`hash_sample` filters on, with the key
    as an exact tiebreak) and the first ``quota`` survive.  Same salt →
    same sample on any cluster size, any engine, any retry.

    Adds ``sample_rank`` (1-based within the stratum).

    Plan shape: ONE exchange on the strata columns + a window sort.  A
    hot stratum funnels through one partition BEFORE the rank filter, so
    at 10^12 rows pass ``prefilter_rate`` — a map-side
    :func:`hash_sample` (SAME salt, so it keeps exactly the rows that
    sort first) applied before the shuffle.  With rate r, the stratum
    ships ~r·|stratum| rows; correctness requires r·|stratum| ≥ quota
    for every stratum (the prefilter keeps the LOWEST-sorting buckets,
    so the top-quota set is preserved whenever enough rows survive —
    asserted cheaply by the caller via max(sample_rank) == quota)."""
    from pyspark.sql import Window

    out = df
    if prefilter_rate is not None:
        out = hash_sample(out, key_col=key_col, rate=prefilter_rate, salt=salt)
    w = (
        Window.partitionBy(*[F.col(c) for c in strata_cols])
        .orderBy(sample_bucket(F.col(key_col), salt), F.col(key_col))
    )
    return (
        out.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= quota)
    )
