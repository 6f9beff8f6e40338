"""Integer PageRank differentials: distributed operator vs a direct
dict-based reference, plus structural sanity (hubs outrank leaves,
no-inbound nodes sit exactly at the teleport floor)."""

import random

import pytest

from doctor_spark.operators.graph import (
    DAMPING_PCT,
    START_MICRO,
    TELEPORT_MICRO,
    pagerank,
)


def ref_pagerank(edge_list, n_iter):
    edges = sorted({(s, d) for s, d in edge_list if s != d})
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    r = {v: START_MICRO for v in nodes}
    for _ in range(n_iter):
        inflow = {v: 0 for v in nodes}
        for s, d in edges:
            inflow[d] += r[s] // deg[s]
        r = {
            v: TELEPORT_MICRO + (DAMPING_PCT * inflow[v]) // 100
            for v in nodes
        }
    return r


@pytest.mark.parametrize("seed,n_nodes,n_edges", [(1, 30, 90), (2, 80, 200)])
def test_matches_reference_random_graph(spark, seed, n_nodes, n_edges):
    rng = random.Random(seed)
    edge_list = [
        (rng.randrange(n_nodes), rng.randrange(n_nodes))
        for _ in range(n_edges)
    ]
    df = spark.createDataFrame(edge_list, "src long, dst long")
    got = {r["node"]: r["rank_micro"] for r in pagerank(df, 4).collect()}
    assert got == ref_pagerank(edge_list, 4)


def test_hub_and_teleport_floor(spark):
    # star: everyone links to 0; 0 links to 1.  Node 0 is the hub;
    # nodes 2..9 have no in-links and must sit exactly at the floor.
    edge_list = [(i, 0) for i in range(1, 10)] + [(0, 1)]
    df = spark.createDataFrame(edge_list, "src long, dst long")
    got = {r["node"]: r["rank_micro"] for r in pagerank(df, 4).collect()}
    assert got == ref_pagerank(edge_list, 4)
    # the hub (in-degree 9) far outranks every leaf; node 1 outranks
    # even the hub because it receives the hub's ENTIRE mass (deg(0)=1)
    assert got[0] > got[2] and got[1] > got[0]
    for v in range(2, 10):
        assert got[v] == TELEPORT_MICRO + (DAMPING_PCT * 0) // 100


def test_duplicate_edges_and_self_loops_ignored(spark):
    edge_list = [(1, 2), (1, 2), (2, 2), (2, 1)]
    df = spark.createDataFrame(edge_list, "src long, dst long")
    got = {r["node"]: r["rank_micro"] for r in pagerank(df, 3).collect()}
    assert got == ref_pagerank(edge_list, 3)
    assert set(got) == {1, 2}
