"""Host-disjoint splitting — domain extraction, determinism, the
leakage invariant, ratio boundaries, and the zero-shuffle plan."""

import hashlib

import pytest
from pyspark.sql import functions as F

from doctor_spark.operators.splits import (
    SECOND_LEVEL_TLDS,
    assign_split,
    registrable_domain,
    split_boundaries,
    split_summary,
)
from doctor_spark.plans.checks import assert_jvm_only, count_exchanges


class TestRegistrableDomain:
    @pytest.mark.parametrize(
        "host,want",
        [
            ("www.example.com", "example.com"),
            ("a.b.news.co.uk", "news.co.uk"),
            ("EXAMPLE.COM", "example.com"),
            ("deep.sub.shop.com.au", "shop.com.au"),
            ("example.com", "example.com"),
            ("co.uk", "co.uk"),          # bare suffix: two labels stand
            ("localhost", "localhost"),  # single label passes through
        ],
    )
    def test_cases(self, spark, host, want):
        df = spark.createDataFrame([(host,)], "host string")
        got = df.select(
            registrable_domain(F.col("host")).alias("d")
        ).collect()[0]["d"]
        assert got == want


class TestAssignSplit:
    def test_leakage_invariant_and_determinism(self, spark):
        rows = [(f"sub{i}.site{i % 20}.example{i % 7}.com",)
                for i in range(200)]
        df = spark.createDataFrame(rows, "host string")
        a = assign_split(df)
        # a domain maps to exactly one split
        leak = (
            a.groupBy("domain")
            .agg(F.countDistinct("split").alias("n"))
            .where(F.col("n") > 1)
            .count()
        )
        assert leak == 0
        # deterministic: same inputs, same assignment
        b = {r["host"]: r["split"] for r in assign_split(df).collect()}
        for r in a.collect():
            assert b[r["host"]] == r["split"]

    def test_matches_md5_reference(self, spark):
        df = spark.createDataFrame(
            [("www.example.com",), ("x.news.co.uk",)], "host string"
        )
        train_hi, val_hi = split_boundaries((0.8, 0.1, 0.1))
        for r in assign_split(df).collect():
            b = hashlib.md5(("split" + r["domain"]).encode()).hexdigest()[:4]
            want = ("train" if b < train_hi
                    else "val" if b < val_hi else "test")
            assert r["split"] == want

    def test_summary_consistent(self, spark):
        rows = [(f"h{i % 50}.example{i % 11}.org",) for i in range(300)]
        df = spark.createDataFrame(rows, "host string")
        s = {r["split"]: (r["n_pages"], r["n_domains"])
             for r in split_summary(assign_split(df)).collect()}
        assert sum(v[0] for v in s.values()) == 300
        assert sum(v[1] for v in s.values()) == 11

    def test_assignment_is_map_only(self, spark):
        df = spark.createDataFrame([("a.example.com",)], "host string")
        q = assign_split(df)
        assert_jvm_only(q)
        assert count_exchanges(q) == 0


class TestCrossSplitLeakage:
    def test_counts(self, spark):
        from doctor_spark.operators.splits import cross_split_leakage

        pairs = spark.createDataFrame(
            [(1, 2), (1, 3), (2, 3), (4, 5)], "id_a long, id_b long"
        )
        assign = spark.createDataFrame(
            [(1, "train"), (2, "train"), (3, "test"), (4, "test"),
             (5, "train")],
            "id long, part string",
        )
        out = cross_split_leakage(pairs, assign).collect()[0]
        # crossing: (1,3), (2,3), (4,5) -> 3 of 4
        assert (out["n_pairs"], out["n_cross"]) == (4, 3)
        assert out["leak_micro"] == (3 * 1_000_000) // 4

    def test_empty_pairs_zero(self, spark):
        from doctor_spark.operators.splits import cross_split_leakage

        pairs = spark.createDataFrame([], "id_a long, id_b long")
        assign = spark.createDataFrame([(1, "a")], "id long, part string")
        out = cross_split_leakage(pairs, assign).collect()[0]
        assert (out["n_pairs"], out["n_cross"], out["leak_micro"]) == (
            0, 0, 0,
        )

    def test_host_disjoint_split_leaks_nothing(self, spark):
        """The audit composes with assign_split: pairs WITHIN a domain
        never cross a host-disjoint split."""
        from doctor_spark.operators.splits import (
            assign_split,
            cross_split_leakage,
        )
        from pyspark.sql import functions as F

        hosts = spark.createDataFrame(
            [(i, f"sub{i}.example{i % 5}.com") for i in range(20)],
            "id long, host string",
        )
        assigned = assign_split(hosts).select(
            "id", F.col("split").alias("part"), "domain"
        )
        # near-dup pairs only between pages of the SAME domain
        a = assigned.alias("a")
        b = assigned.alias("b")
        pairs = (
            a.join(b, F.col("a.domain") == F.col("b.domain"))
            .where(F.col("a.id") < F.col("b.id"))
            .select(
                F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
            )
        )
        out = cross_split_leakage(
            pairs, assigned.select("id", "part")
        ).collect()[0]
        assert out["n_pairs"] > 0 and out["n_cross"] == 0
