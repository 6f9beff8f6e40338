"""Integer-exact TrustRank — arithmetic vs a plain-Python replica and
the seed-propagation structural properties."""

import pytest

MICRO = 1_000_000


def trustrank(*a, **kw):
    from doctor_spark.operators.graph import trustrank as f

    return f(*a, **kw)


def _replica(edges, seeds, n_iter=4):
    e = sorted({(s, d) for s, d in edges if s != d})
    deg = {}
    for s, _ in e:
        deg[s] = deg.get(s, 0) + 1
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    seeds = set(seeds) & set(nodes)
    t = {v: MICRO if v in seeds else 0 for v in nodes}
    for _ in range(n_iter):
        inflow = {}
        for s, d in e:
            inflow[d] = inflow.get(d, 0) + t[s] // deg[s]
        t = {
            v: (15 * (MICRO if v in seeds else 0)) // 100
            + (85 * inflow.get(v, 0)) // 100
            for v in nodes
        }
    return t


# seed 1 reaches 2, 3 (via 2), 4; node 5 is linked only from spam 6<->7
EDGES = [(1, 2), (2, 3), (1, 4), (6, 7), (7, 6), (6, 5), (3, 1), (1, 1)]
SEEDS = [1]


@pytest.fixture(scope="module")
def graph(spark):
    return spark.createDataFrame(EDGES, "src long, dst long")


@pytest.fixture(scope="module")
def seed_df(spark):
    return spark.createDataFrame([(s,) for s in SEEDS], "node long")


class TestTrustRank:
    def test_matches_integer_replica(self, spark, graph, seed_df):
        out = {
            r["node"]: r["trust_micro"]
            for r in trustrank(graph, seed_df, n_iter=4).collect()
        }
        assert out == _replica(EDGES, SEEDS, n_iter=4)

    def test_spam_region_gets_zero(self, spark, graph, seed_df):
        out = {
            r["node"]: r["trust_micro"]
            for r in trustrank(graph, seed_df, n_iter=4).collect()
        }
        # unreachable from the seed: exactly zero trust
        assert out[5] == 0 and out[6] == 0 and out[7] == 0
        # the seed and its outlink targets carry trust
        assert out[1] > 0 and out[2] > 0 and out[4] > 0
        # one hop from seed beats two hops (damping monotonicity here)
        assert out[2] > out[3]

    def test_no_seeds_all_zero(self, spark, graph):
        s = spark.createDataFrame([], "node long")
        out = trustrank(graph, s, n_iter=2).collect()
        assert out and all(r["trust_micro"] == 0 for r in out)

    def test_seed_outside_graph_ignored(self, spark, graph, seed_df):
        s2 = seed_df.sparkSession.createDataFrame(
            [(1,), (999,)], "node long"
        )
        a = {r["node"]: r["trust_micro"]
             for r in trustrank(graph, seed_df).collect()}
        b = {r["node"]: r["trust_micro"]
             for r in trustrank(graph, s2).collect()}
        assert a == b
