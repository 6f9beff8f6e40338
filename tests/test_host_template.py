"""host_template_lines: fraction semantics, row-local distinct, plan."""

from pyspark.sql import functions as F

from doctor_spark.operators.dedup import host_template_lines
from doctor_spark.plans.checks import count_exchanges, physical_plan


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, host string, text string")


def test_fraction_and_threshold_semantics(spark):
    rows = [
        # host a: 4 docs; "welcome" on all 4, "cookie" on 2 (50% < 60%),
        # "special" on 3 (75% >= 60%)
        (1, "a", "Welcome\ncookie\nspecial\nbody one"),
        (2, "a", "welcome \nspecial\nbody two"),
        (3, "a", "WELCOME\ncookie\nspecial\nbody three"),
        (4, "a", "welcome\nbody four"),
        # host b: 1 doc only -> below min_host_docs
        (5, "b", "welcome\nwhatever"),
    ]
    got = {
        (r["host"], r["line"]): (r["n_docs"], r["host_docs"])
        for r in host_template_lines(_df(spark, rows)).collect()
    }
    assert got == {("a", "welcome"): (4, 4), ("a", "special"): (3, 4)}


def test_row_local_distinct_and_normalization(spark):
    # the same line twice in ONE doc counts once; \t\r runs collapse
    rows = [
        (1, "h", "Nav  Bar\nnav\tbar\ncontent"),
        (2, "h", "nav \r bar\nother"),
    ]
    got = {
        r["line"]: r["n_docs"]
        for r in host_template_lines(_df(spark, rows)).collect()
    }
    assert got == {"nav bar": 2}


def test_null_text_excluded_from_both_counts(spark):
    rows = [(1, "h", "t\nx"), (2, "h", "t\ny"), (3, "h", None)]
    r = host_template_lines(_df(spark, rows)).collect()
    assert {(x["line"], x["n_docs"], x["host_docs"]) for x in r} == {
        ("t", 2, 2)
    }


def test_plan_shape(spark):
    q = host_template_lines(_df(spark, [(1, "h", "a\nb")]))
    plan = physical_plan(q)
    # line agg + host agg + the host-keyed join's exchanges; the
    # critical property: NO distinct exchange on the exploded lines
    # (distinct is row-local) and no Python anywhere
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "array_distinct" in plan
    assert count_exchanges(q) <= 4, plan
