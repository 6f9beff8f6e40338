"""Host-level quality rollup gate — semantics, boundaries, plan shape."""

import pytest
from pyspark.sql import functions as F

from doctor_spark.operators.hostgate import (
    host_quality_gate,
    host_quality_rollup,
)
from doctor_spark.plans.checks import (
    assert_jvm_only,
    count_exchanges,
    physical_plan,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "host string, passes boolean")


def test_rollup_fraction_boundary_inclusive(spark):
    # 3 fail of 6 docs at max_fail_pct=50: 3*100 <= 6*50 → kept (inclusive)
    rows = [("a.example", i % 2 == 0) for i in range(6)]
    out = host_quality_rollup(
        _df(spark, rows), passes=F.col("passes"),
        min_docs=5, max_fail_pct=50,
    ).collect()
    assert out[0].n_docs == 6 and out[0].n_fail == 3 and out[0].host_ok


def test_rollup_fraction_boundary_exceeded(spark):
    # 4 fail of 6: 400 > 300 → dropped
    rows = [("a.example", i >= 4) for i in range(6)]
    out = host_quality_rollup(
        _df(spark, rows), passes=F.col("passes"),
        min_docs=5, max_fail_pct=50,
    ).collect()
    assert out[0].n_fail == 4 and not out[0].host_ok


def test_rollup_small_host_benefit_of_doubt(spark):
    # 4 docs all failing, min_docs=5 → too small to judge, kept
    rows = [("tiny.example", False)] * 4
    out = host_quality_rollup(
        _df(spark, rows), passes=F.col("passes"),
        min_docs=5, max_fail_pct=50,
    ).collect()
    assert out[0].n_fail == 4 and out[0].host_ok


def test_gate_marks_not_filters(spark):
    rows = [("bad.example", False)] * 8 + [("good.example", True)] * 8
    docs = _df(spark, rows)
    out = host_quality_gate(docs, passes=F.col("passes"),
                            min_docs=5, max_fail_pct=50)
    assert out.count() == 16  # every row survives, marked
    by_host = {
        r.host: r.host_ok for r in out.select("host", "host_ok").distinct().collect()
    }
    assert by_host == {"bad.example": False, "good.example": True}


def test_gate_default_gopher_verdict(spark):
    good = ("the court held that the motion must be denied because "
            "the record shows the parties had agreed to the terms and "
            "the statute requires notice before any hearing may be "
            "held in this matter today ") * 3
    docs = spark.createDataFrame(
        [("h.example", good)] * 3 + [("h.example", "short junk")] * 1,
        "host string, text string",
    )
    out = host_quality_gate(docs, min_docs=1, max_fail_pct=30)
    rows = out.collect()
    # 1 fail of 4 docs: 100 <= 120 → host kept; per-doc passes varies
    assert all(r.host_ok for r in rows)
    assert sum(1 for r in rows if not r.passes) == 1


def test_plan_one_rowvolume_exchange_jvm_only(spark):
    docs = spark.createDataFrame(
        [("h%d.example" % (i % 3), bool(i % 2)) for i in range(30)],
        "host string, passes boolean",
    )
    out = host_quality_gate(docs, passes=F.col("passes"))
    assert_jvm_only(out)
    # rollup agg + join repartitioning: small fixed number of exchanges,
    # and never a cartesian/nested-loop
    plan = physical_plan(out, "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert count_exchanges(out) <= 3, plan
