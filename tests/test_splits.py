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
