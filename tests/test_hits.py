"""Integer-exact HITS — fixed-point arithmetic vs a plain-Python
replica, structural properties, and the checkpointed-join plan shape."""

import pytest
from pyspark.sql import functions as F

MICRO = 1_000_000


def hits(*a, **kw):
    from doctor_spark.operators.graph import hits as f

    return f(*a, **kw)


def _replica(edges, n_iter=3):
    """The operator's exact integer arithmetic in plain Python."""
    e = sorted({(s, d) for s, d in edges if s != d})
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    hub = {v: MICRO for v in nodes}
    auth = {}
    for _ in range(n_iter):
        a_raw = {}
        for s, d in e:
            a_raw[d] = a_raw.get(d, 0) + hub[s]
        mx = max(max(a_raw.values(), default=0), 1)
        auth = {v: (a_raw.get(v, 0) * MICRO) // mx for v in nodes}
        h_raw = {}
        for s, d in e:
            h_raw[s] = h_raw.get(s, 0) + auth[d]
        mx = max(max(h_raw.values(), default=0), 1)
        hub = {v: (h_raw.get(v, 0) * MICRO) // mx for v in nodes}
    return hub, auth


EDGES = [(1, 3), (2, 3), (2, 4), (5, 3), (2, 2), (1, 3)]  # loop + dup


@pytest.fixture(scope="module")
def graph(spark):
    return spark.createDataFrame(EDGES, "src long, dst long")


class TestHits:
    def test_matches_integer_replica(self, spark, graph):
        out = {
            r["node"]: (r["hub_micro"], r["auth_micro"])
            for r in hits(graph, n_iter=3).collect()
        }
        hub, auth = _replica(EDGES, n_iter=3)
        assert out == {v: (hub[v], auth[v]) for v in hub}

    def test_structural_fixed_points(self, spark, graph):
        out = {
            r["node"]: (r["hub_micro"], r["auth_micro"])
            for r in hits(graph, n_iter=3).collect()
        }
        # node 3 is the dominant authority (all hubs point at it) and
        # node 2 the dominant hub (points at both authorities): L-inf
        # normalization pins both at exactly 1e6
        assert out[3][1] == MICRO and out[2][0] == MICRO
        # pure sources have zero authority; pure sinks zero hub
        assert out[1][1] == 0 and out[5][1] == 0
        assert out[3][0] == 0 and out[4][0] == 0

    def test_self_loops_and_dups_ignored(self, spark):
        base = [(1, 3), (2, 3), (2, 4), (5, 3)]
        noisy = base + [(2, 2), (1, 3), (5, 5)]
        s = pytest.importorskip("pyspark.sql").SparkSession.getActiveSession()
        a = hits(s.createDataFrame(base, "src long, dst long")).collect()
        b = hits(s.createDataFrame(noisy, "src long, dst long")).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_empty_graph_after_loop_filter(self, spark):
        only_loops = spark.createDataFrame([(1, 1)], "src long, dst long")
        assert hits(only_loops).collect() == []
