"""Multi-source BFS seed distances — exactness within the hop cap,
multi-seed min, unreached omission."""


def seed_distances(*a, **kw):
    from doctor_spark.operators.graph import seed_distances as f

    return f(*a, **kw)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _seeds(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "doc_id long")


class TestSeedDistances:
    def test_chain_depths_exact_within_cap(self, spark):
        e = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5)])
        out = {
            r["node"]: r["depth"]
            for r in seed_distances(e, _seeds(spark, [0]), n_iter=4).collect()
        }
        assert out == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4}
        # node 5 is 5 hops away: beyond the cap -> absent, not wrong
        assert 5 not in out

    def test_multi_seed_takes_min(self, spark):
        e = _edges(spark, [(0, 1), (1, 2), (9, 2)])
        out = {
            r["node"]: r["depth"]
            for r in seed_distances(
                e, _seeds(spark, [0, 9]), n_iter=4
            ).collect()
        }
        assert out[2] == 1  # via seed 9, not depth 2 via seed 0

    def test_shortcut_beats_long_path(self, spark):
        e = _edges(spark, [(0, 1), (1, 2), (2, 3), (0, 3)])
        out = {
            r["node"]: r["depth"]
            for r in seed_distances(e, _seeds(spark, [0]), n_iter=4).collect()
        }
        assert out[3] == 1

    def test_cycle_terminates_with_exact_depths(self, spark):
        e = _edges(spark, [(0, 1), (1, 2), (2, 0)])
        out = {
            r["node"]: r["depth"]
            for r in seed_distances(e, _seeds(spark, [0]), n_iter=4).collect()
        }
        assert out == {0: 0, 1: 1, 2: 2}

    def test_seed_unreached_by_edges_still_depth_zero(self, spark):
        e = _edges(spark, [(5, 6)])
        out = {
            r["node"]: r["depth"]
            for r in seed_distances(e, _seeds(spark, [0]), n_iter=2).collect()
        }
        assert out == {0: 0}
