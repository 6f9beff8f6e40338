"""Inverted posting-list shard — semantics, cap behavior, plan shape."""

import pytest
from pyspark.sql import functions as F

from doctor_spark.operators.postings import inverted_postings, term_dfs
from doctor_spark.plans.checks import assert_jvm_only, physical_plan


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog sat"),
            (3, "the cat ran"),
            (4, "   "),
        ],
        "doc_id long, text string",
    )


def test_term_dfs_row_local_distinct(spark, corpus):
    dfs = {r.term: r.df for r in term_dfs(corpus).collect()}
    # "the" appears twice in doc 1 but df counts documents
    assert dfs["the"] == 3
    assert dfs["cat"] == 2 and dfs["dog"] == 1 and dfs["sat"] == 2


def test_positions_and_df(spark, corpus):
    out = inverted_postings(corpus, df_cap=10)
    rows = {(r.term, r.doc_id): r for r in out.collect()}
    r = rows[("the", 1)]
    assert r.positions == "0,4" and r.df == 3
    assert rows[("cat", 3)].positions == "1"
    assert rows[("mat", 1)].positions == "5"


def test_df_cap_binds(spark, corpus):
    out = inverted_postings(corpus, df_cap=2)
    terms = {r.term for r in out.collect()}
    assert "the" not in terms            # df 3 > cap 2: no postings
    assert "cat" in terms and "sat" in terms


def test_blank_docs_excluded(spark, corpus):
    out = inverted_postings(corpus, df_cap=10)
    assert out.where(F.col("doc_id") == 4).count() == 0


def test_plan_anti_join_broadcasts_hot_side(spark, corpus):
    out = inverted_postings(corpus, df_cap=2)
    assert_jvm_only(out)
    plan = physical_plan(out, "simple")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    assert "CartesianProduct" not in plan
