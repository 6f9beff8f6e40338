"""Mirror-site detection — overlap semantics, boilerplate cap, plan."""

import pytest
from pyspark.sql import functions as F

from doctor_spark.operators.mirrors import host_mirror_pairs
from doctor_spark.plans.checks import assert_jvm_only, physical_plan


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    # true mirror cluster: a.example / b.example / c.example share two
    # payloads; c also carries private content
    for h in ("a.example", "b.example", "c.example"):
        rows.append((h, "payload one"))
        rows.append((h, "payload two"))
    rows.append(("c.example", "only on c"))
    # boilerplate footer on EVERY host incl. unrelated ones
    for h in ("a.example", "b.example", "c.example", "d.example",
              "e.example", "f.example"):
        rows.append((h, "copyright footer"))
    # duplicate row on one host: (host, fp) must be distinct-ed
    rows.append(("a.example", "payload one"))
    rows.append(("d.example", "private d"))
    rows.append(("e.example", "   "))  # blank: excluded
    return rows


def _df(spark, rows):
    return spark.createDataFrame(rows, "host string, text string")


def test_overlap_and_sizes(spark, corpus):
    out = host_mirror_pairs(_df(spark, corpus), host_cap=16)
    rows = {(r.host1, r.host2): r for r in out.collect()}
    r = rows[("a.example", "b.example")]
    # footer is under the generous cap here: 3 payload/footer shared
    assert r.n_shared == 3 and r.n1 == 3 and r.n2 == 3
    assert r.overlap_micro == 1_000_000
    r = rows[("a.example", "c.example")]
    assert r.n_shared == 3 and r.n2 == 4          # c has private doc
    assert r.overlap_micro == 1_000_000           # min side contained
    r = rows[("c.example", "d.example")]          # footer-only pair
    assert r.n_shared == 1
    assert r.overlap_micro == 1_000_000 // 2      # 1 of min(4,2)=2


def test_host_cap_drops_boilerplate(spark, corpus):
    out = host_mirror_pairs(_df(spark, corpus), host_cap=4)
    rows = {(r.host1, r.host2): r for r in out.collect()}
    # footer fp spans 6 hosts > cap 4: footer-only pairs vanish
    assert ("c.example", "d.example") not in rows
    assert ("d.example", "e.example") not in rows
    # mirror pairs survive with the footer EXCLUDED from n_shared
    assert rows[("a.example", "b.example")].n_shared == 2
    # but sizes still count the capped fp (honest denominator)
    assert rows[("a.example", "b.example")].n1 == 3


def test_min_shared_binds(spark, corpus):
    out = host_mirror_pairs(_df(spark, corpus), host_cap=16,
                            min_shared=2)
    pairs = {(r.host1, r.host2) for r in out.collect()}
    assert pairs == {("a.example", "b.example"),
                     ("a.example", "c.example"),
                     ("b.example", "c.example")}


def test_pair_order_and_plan(spark, corpus):
    out = host_mirror_pairs(_df(spark, corpus), host_cap=16)
    assert out.where(F.col("host1") >= F.col("host2")).count() == 0
    assert_jvm_only(out)
    plan = physical_plan(out, "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
