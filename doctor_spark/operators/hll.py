"""HyperLogLog distinct-cardinality sketch — integer-exact registers.

The crawl-coverage question — "how many DISTINCT urls did we see per
host (per day, per snapshot)?" — is a `count(distinct ...)` whose exact
form shuffles every occurrence on the value key.  At 10^12 pages that
exchange is the job.  HLL (Flajolet et al. 2007, the HyperLogLog paper;
the same sketch behind Spark's own ``approx_count_distinct``) replaces
it with a CONSTANT-size mergeable summary: ``m = 2^p`` registers per
key, each the max leading-zero run observed in that register's hash
sub-stream.

Rebuilt here (rather than calling ``approx_count_distinct``) for the
same reason the CMS module rebuilds Spark's countMinSketch: the
register table must be (a) REPLAYABLE by the DuckDB oracle bit-for-bit,
(b) exposed as a first-class DataFrame so snapshots can be merged
(max per register) across days without touching the raw data again,
and (c) integer-exact end-to-end so two engines — or two cluster runs —
can never drift in the last ulp.

Exactness contract (every step agrees with the DuckDB oracle,
cross-engine probe-tested):

* 60-bit hash: ``conv(substring(md5(item), 1, 15), 16, 10)`` — the
  repo-wide digest-slicing idiom (same as MinHash w128 / CMS).
* register = top ``p=12`` bits, ``w`` = low 48 bits,
  ``rho = 49 - bitlength(w)`` (``49`` when ``w = 0``); bitlength via
  ``length(bin(w))`` on Spark == ``length(printf('%b', w))`` on DuckDB.
* estimator sum in SCALED INTEGERS: each register contributes
  ``2^(32 - rho)`` (``0`` when ``rho > 32`` — a deliberate, documented
  floor applied identically by both engines; the discarded terms are
  < 2^-32 of the harmonic sum).  Absent registers are rho=0 and
  contribute ``2^32`` each.  ``sum_scaled ≤ m·2^32 = 2^44`` — int64.
* raw estimate ``E = alpha_m · m^2 / Z`` evaluated as one exact
  integer floor-division: ``num = ALPHA_MICRO · m^2 · 2^32`` (a 22-digit
  constant, DECIMAL(38,0) / HUGEINT) and
  ``est = (num - num % den) / den`` — the mod-subtract makes the
  numerator exactly divisible, so the quotient is exact under ANY
  division rounding mode (probe-tested vs Python ``//``).

The raw estimate is what the DataFrame carries (both engines replay
it).  The standard small-range linear-counting correction needs a
float ``ln`` — :func:`hll_correct` applies it caller-side from the
``v_zero`` column the estimate row already carries.  Relative error at
p=12 is ~1.04/sqrt(4096) ≈ 1.6% (accuracy pytest-gated at ≤5%).

At 100 TB: one keyed exchange bounded by ``keys × 4096`` rows with
map-side max partials (a hot host combines to ≤4096 rows per partition
BEFORE the shuffle — skew-immune by construction), then a tiny per-key
aggregate.  Zero Python anywhere; every expression is whole-stage
codegen.

No reference counterpart (freelawproject/doctor has no analytics
tier); this is part of the training-data operator family.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

P = 12                     # register index bits
M = 1 << P                 # 4096 registers
HASH_HEX = 15              # md5 hex prefix length -> 60-bit hash
Q = 60 - P                 # 48 bits feed the leading-zero count
RHO_MAX = Q + 1            # 49 (w == 0)
RHO_CAP = 32               # registers with rho > 32 floor to term 0
# alpha_4096 = 0.7213 / (1 + 1.079/4096) = 0.7211100...; micro-scaled
ALPHA_MICRO = 721110
# numerator of the estimator: alpha * m^2 * 2^RHO_CAP, micro-scaled.
# 22 digits -> DECIMAL(38,0) on Spark, HUGEINT on DuckDB.
EST_NUM = ALPHA_MICRO * M * M * (1 << RHO_CAP)
# below this denominator the int64 cast could overflow; such a sum
# requires >3/4 of all registers at rho>32 (cardinality ~2^40+) --
# out of the p=12 operating range, emitted as NULL by contract
DEN_MIN = 1024


def _h60(item: F.Column) -> F.Column:
    """60-bit hash: first 15 hex digits of md5(utf8(item)), as long."""
    return F.conv(
        F.substring(F.md5(F.encode(item, "UTF-8")), 1, HASH_HEX), 16, 10
    ).cast("long")


def hll_registers(
    df: DataFrame, key_cols: list[str], item_col: str
) -> DataFrame:
    """Per-key register table ``(*key_cols, reg, rho)``.

    ONE keyed exchange on ``(*key_cols, reg)``; ``max`` combines
    map-side, so the exchange input is ≤ ``m`` rows per key per
    partition regardless of how hot the key is.  NULL items are
    dropped (they carry no distinct value).
    """
    h = _h60(F.col(item_col))
    w = h.bitwiseAND(F.lit((1 << Q) - 1))
    rho = (
        F.when(w == F.lit(0), F.lit(RHO_MAX))
        .otherwise(F.lit(RHO_MAX) - F.length(F.bin(w)))
        .cast("int")
    )
    return (
        df.where(F.col(item_col).isNotNull())
        .select(*key_cols, F.shiftright(h, Q).cast("int").alias("reg"),
                rho.alias("rho"))
        .groupBy(*key_cols, "reg")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(*register_dfs: DataFrame) -> DataFrame:
    """Merge register tables (e.g. daily snapshots -> corpus total):
    union -> max per (key, reg).  Lossless: merging registers of A and
    B yields EXACTLY the registers of A ∪ B (max is associative,
    commutative, idempotent) — property-tested."""
    it = iter(register_dfs)
    out = next(it)
    for df in it:
        out = out.unionByName(df)
    keys = [c for c in out.columns if c not in ("reg", "rho")]
    return out.groupBy(*keys, "reg").agg(F.max("rho").alias("rho"))


def hll_estimate(registers: DataFrame, key_cols: list[str]) -> DataFrame:
    """Raw HLL estimate per key from a register table.

    Output: ``(*key_cols, n_regs, v_zero, sum_scaled, est_distinct)``
    — all BIGINT, all integer-exact (see module docstring for the
    scaled-sum + mod-subtract division contract).  ``v_zero`` (count of
    never-hit registers) is carried so :func:`hll_correct` can apply
    the linear-counting small-range correction caller-side.
    """
    # 2^(32 - rho) for rho <= 32 else 0; shiftleft's shift operand must
    # be an expression, so spell it in SQL
    term = F.expr(
        f"CASE WHEN rho <= {RHO_CAP} "
        f"THEN shiftleft(CAST(1 AS BIGINT), {RHO_CAP} - rho) "
        f"ELSE CAST(0 AS BIGINT) END"
    )
    agg = registers.groupBy(*key_cols).agg(
        F.count("*").cast("long").alias("n_regs"),
        F.sum(term).alias("sum_terms"),
    )
    v_zero = (F.lit(M) - F.col("n_regs")).cast("long")
    den = (F.col("sum_terms") + v_zero * F.lit(1 << RHO_CAP)).cast("long")
    # 22-digit literal exceeds py4j's long bridge -> string-cast decimal
    num = F.expr(f"CAST('{EST_NUM}' AS DECIMAL(38,0))")
    # exact two-step floor: (num // den) // 10^6 == floor(num / (den*10^6))
    # for positive integers, unwinding ALPHA_MICRO's micro scale
    q1 = (num - num % den) / den
    mega = F.lit(1_000_000).cast("decimal(38,0)")
    est = F.when(
        den >= F.lit(DEN_MIN),
        ((q1 - q1 % mega) / mega).cast("long"),
    ).otherwise(F.lit(None).cast("long"))
    return agg.select(
        *key_cols,
        "n_regs",
        v_zero.alias("v_zero"),
        den.alias("sum_scaled"),
        est.alias("est_distinct"),
    )


def hll_distinct(
    df: DataFrame, key_cols: list[str], item_col: str
) -> DataFrame:
    """registers -> estimate in one plan (two bounded keyed exchanges)."""
    return hll_estimate(hll_registers(df, key_cols, item_col), key_cols)


def hll_correct(est_distinct: int, v_zero: int) -> float:
    """Flajolet small-range correction (caller-side float math — the
    only non-integer step, deliberately OUTSIDE the oracle-hashed
    DataFrame): linear counting ``m·ln(m/V)`` when the raw estimate is
    below 2.5m and empty registers remain."""
    if v_zero > 0 and est_distinct is not None and est_distinct <= 2.5 * M:
        return M * math.log(M / v_zero)
    return float(est_distinct)
