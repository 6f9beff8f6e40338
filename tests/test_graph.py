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


# -------------------------------------------- redirect-chain resolution


def ref_resolve(edge_list, max_hops=16):
    """Direct per-URL walker: follow min-dst successors until a node
    with no out-edge (resolved) or the hop budget runs out."""
    succ = {}
    for s, d in edge_list:
        succ[s] = min(succ[s], d) if s in succ else d
    out = {}
    for u in succ:
        cur, hops = succ[u], 1
        while cur in succ and hops < max_hops:
            cur, hops = succ[cur], hops + 1
        if cur in succ:
            out[u] = (None, None, False)
        else:
            out[u] = (cur, hops, True)
    return out


def _run_resolve(spark, edge_list, **kw):
    from doctor_spark.operators.graph import resolve_redirects

    df = spark.createDataFrame(edge_list, "src string, dst string")
    return {
        r.url: (r.final_url, r.n_hops, r.resolved)
        for r in resolve_redirects(df, **kw).collect()
    }


def test_resolve_chain_cycle_terminal(spark):
    edges = [
        # 3-hop chain a->b->c->T
        ("a", "b"), ("b", "c"), ("c", "T"),
        # 2-cycle with a tail: t -> x <-> y
        ("t", "x"), ("x", "y"), ("y", "x"),
        # self-loop
        ("s", "s"),
    ]
    got = _run_resolve(spark, edges)
    assert got == ref_resolve(edges)
    assert got["a"] == ("T", 3, True)
    assert got["c"] == ("T", 1, True)
    assert got["t"] == (None, None, False)
    assert got["s"] == (None, None, False)


def test_resolve_hop_budget_and_min_dst(spark):
    # chain of exactly 16 resolves; 17 does not (browser give-up)
    chain17 = [(f"n{i}", f"n{i+1}") for i in range(17)]
    got = _run_resolve(spark, chain17)
    assert got == ref_resolve(chain17)
    assert got["n1"] == ("n17", 16, True)
    assert got["n0"] == (None, None, False)
    # conflicting snapshots: min(dst) wins deterministically
    got = _run_resolve(spark, [("u", "z"), ("u", "a"), ("a", "T")])
    assert got["u"] == ("T", 2, True)


@pytest.mark.parametrize("max_hops", [1, 3, 10])
def test_resolve_non_power_of_two_budget(spark, max_hops):
    chain = [(f"m{i}", f"m{i+1}") for i in range(12)]
    assert _run_resolve(spark, chain, max_hops=max_hops) == ref_resolve(
        chain, max_hops=max_hops
    )


def test_resolve_random_differential(spark):
    rng = random.Random(7)
    edges = list({
        (f"p{rng.randrange(60)}", f"p{rng.randrange(80)}")
        for _ in range(70)
    })
    assert _run_resolve(spark, edges) == ref_resolve(edges)


def test_degree_histogram_tiny(spark):
    from doctor_spark.operators.graph import degree_histogram

    # 0->1, 0->2, 1->2, 2->2 (self-loop dropped), 0->1 dup (dropped)
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (2, 2), (0, 1)], "src long, dst long"
    )
    got = {
        (r["side"], r["deg"]): r["n_nodes"]
        for r in degree_histogram(edges).collect()
    }
    # out: node0 deg2, node1 deg1 -> {2:1, 1:1}; in: node1 deg1, node2 deg2
    assert got == {
        ("out", 2): 1,
        ("out", 1): 1,
        ("in", 1): 1,
        ("in", 2): 1,
    }
