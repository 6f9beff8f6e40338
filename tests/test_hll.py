"""HyperLogLog sketch: accuracy, merge algebra, plan shape, and the
integer-exactness probes the oracle relies on."""

import math

import pytest
from pyspark.sql import functions as F

from doctor_spark.operators.hll import (
    ALPHA_MICRO,
    DEN_MIN,
    EST_NUM,
    M,
    P,
    Q,
    RHO_CAP,
    RHO_MAX,
    hll_correct,
    hll_distinct,
    hll_estimate,
    hll_merge,
    hll_registers,
)
from doctor_spark.plans.checks import (
    assert_jvm_only,
    count_exchanges,
    physical_plan,
)


def _items(spark, n_rows: int, n_distinct: int, key: str = "k"):
    """n_rows rows over exactly n_distinct item values (round-robin)."""
    return spark.range(n_rows).select(
        F.lit(key).alias("host"),
        F.concat(F.lit("item-"), (F.col("id") % n_distinct)).alias("url"),
    )


def test_constants_are_consistent():
    assert M == 1 << P and RHO_MAX == Q + 1
    # alpha_m spec: 0.7213 / (1 + 1.079/m), micro-floored
    assert ALPHA_MICRO == int(0.7213 / (1 + 1.079 / M) * 1_000_000)
    assert EST_NUM == ALPHA_MICRO * M * M * (1 << RHO_CAP)


def test_registers_match_python_reference(spark):
    """The Spark register table equals a from-first-principles Python
    replay of the documented hash spec (md5-prefix 60-bit, top-12 reg,
    49 - bitlength rho)."""
    import hashlib

    vals = ["a", "b", "host-42/url-17", "", "unicode-héllo", "x" * 300]
    df = spark.createDataFrame([(v,) for v in vals], "url string").select(
        F.lit("h").alias("host"), "url"
    )
    got = {
        (r["reg"], r["rho"])
        for r in hll_registers(df, ["host"], "url").collect()
    }
    regs = {}
    for v in vals:
        h = int(hashlib.md5(v.encode()).hexdigest()[:15], 16)
        reg, w = h >> Q, h & ((1 << Q) - 1)
        rho = RHO_MAX if w == 0 else RHO_MAX - w.bit_length()
        regs[reg] = max(regs.get(reg, 0), rho)
    assert got == set(regs.items())


def test_accuracy_normal_range(spark):
    """p=12 standard error is ~1.6%; gate raw estimate at ±5% over a
    spread of cardinalities in the estimator's uncorrected range."""
    for true_n in (20_000, 60_000, 150_000):
        df = _items(spark, true_n + 5_000, true_n)
        row = hll_distinct(df, ["host"], "url").collect()[0]
        est = hll_correct(row["est_distinct"], row["v_zero"])
        assert abs(est / true_n - 1) < 0.05, (true_n, est)


def test_accuracy_small_range_linear_counting(spark):
    """Small cardinalities land in the linear-counting branch, which
    is tighter than the raw estimate."""
    for true_n in (37, 300, 2_000):
        df = _items(spark, 3 * true_n, true_n)
        row = hll_distinct(df, ["host"], "url").collect()[0]
        assert row["v_zero"] > 0
        est = hll_correct(row["est_distinct"], row["v_zero"])
        assert abs(est / true_n - 1) < 0.05, (true_n, est)


def test_merge_equals_union(spark):
    """merge(registers(A), registers(B)) == registers(A ∪ B), EXACTLY —
    the property that makes daily-snapshot rollups lossless."""
    a = _items(spark, 4_000, 1_500)
    b = spark.range(3_000).select(
        F.lit("k").alias("host"),
        F.concat(F.lit("item-"), (F.col("id") % 2_200) + 800).alias("url"),
    )
    merged = {
        (r["reg"], r["rho"])
        for r in hll_merge(
            hll_registers(a, ["host"], "url"),
            hll_registers(b, ["host"], "url"),
        ).collect()
    }
    direct = {
        (r["reg"], r["rho"])
        for r in hll_registers(a.unionByName(b), ["host"], "url").collect()
    }
    assert merged == direct


def test_estimate_row_shape_and_null_policy(spark):
    df = _items(spark, 100, 50)
    out = hll_distinct(df, ["host"], "url")
    assert out.columns == ["host", "n_regs", "v_zero", "sum_scaled",
                           "est_distinct"]
    row = out.collect()[0]
    assert row["n_regs"] + row["v_zero"] == M
    # integer replay of the estimator from the carried columns
    assert row["sum_scaled"] >= DEN_MIN
    assert row["est_distinct"] == EST_NUM // row["sum_scaled"] // 1_000_000
    # NULL items contribute nothing
    with_null = df.unionByName(
        spark.createDataFrame([("k", None)], "host string, url string")
    )
    row2 = hll_distinct(with_null, ["host"], "url").collect()[0]
    assert (row2["sum_scaled"], row2["est_distinct"]) == (
        row["sum_scaled"], row["est_distinct"])


def test_plan_two_exchanges_jvm_only(spark):
    df = _items(spark, 1_000, 400)
    q = hll_distinct(df, ["host"], "url")
    assert_jvm_only(q)
    plan = physical_plan(q)
    # register agg + estimate agg; both hash aggregates with map-side
    # partials, nothing else moves data
    assert count_exchanges(q) == 2, plan
    assert "partial_max" in plan, plan


def test_hot_key_exchange_is_bounded(spark):
    """A maximally hot key still ships <= M rows per map partition into
    the register exchange (map-side max combine) — the skew-immunity
    claim, asserted via the partial aggregate in the plan and the
    register-table row bound."""
    df = _items(spark, 50_000, 30_000)  # one key, many rows
    regs = hll_registers(df, ["host"], "url")
    assert regs.count() <= M
    assert "partial_max" in physical_plan(regs), physical_plan(regs)


def test_correct_passthrough_above_lc_range():
    assert hll_correct(100_000, 0) == 100_000.0
    assert hll_correct(100_000, 5) == 100_000.0  # above 2.5m
    lc = hll_correct(1_000, 3_500)
    assert lc == pytest.approx(M * math.log(M / 3_500))
