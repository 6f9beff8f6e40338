"""Lloyd k-means trainer vs an independent pure-Python reference on
hostile synthetic embeddings: duplicate points (tie-bait — equidistant to
identical centroids), a cluster that empties (k initial centers where two
coincide, so one never wins a tie and keeps its init centroid), negative
coordinates (the floor-vs-truncate division trap), and convergence."""

import math
import random

import pytest

from doctor_spark.operators.kmeans import MICRO, kmeans_clusters, kmeans_train


def _ref_kmeans(vecs, k, iters):
    """Independent reference: plain dict/loop implementation of the same
    integer contract (quantize, int squared-L2, (dist, cid) tie-break,
    floor-div update, empty keeps previous)."""
    q = {i: [math.floor(float(x) * MICRO + 0.5) for x in v]
         for i, v in vecs.items()}
    cents = [list(q[i]) for i in sorted(q)[:k]]

    def assign():
        out = {}
        for i, v in q.items():
            best = min(
                (sum((a - b) * (a - b) for a, b in zip(v, c)), cid)
                for cid, c in enumerate(cents)
            )
            out[i] = best[1]
        return out

    for _ in range(iters):
        a = assign()
        for c in range(k):
            members = [q[i] for i, cl in a.items() if cl == c]
            if members:
                n = len(members)
                cents[c] = [sum(col) // n for col in zip(*members)]
    return assign(), cents


@pytest.mark.parametrize("seed", [3, 11])
def test_kmeans_matches_reference(spark, seed):
    rng = random.Random(seed)
    dim, k, n = 6, 4, 40
    vecs = {}
    for i in range(n):
        vecs[i] = [rng.uniform(-1, 1) for _ in range(dim)]
    # tie-bait: ids 0 and 1 identical -> two coinciding init centroids,
    # centroid 1 never wins a tie and its cluster stays empty
    vecs[1] = list(vecs[0])
    # exact duplicates deeper in the set
    vecs[n - 1] = list(vecs[7])

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in sorted(vecs.items())],
        "vec_id long, embedding array<float>",
    )
    # float32 storage: quantize the reference from float32 values too
    import numpy as np
    f32 = {i: [float(np.float32(x)) for x in v] for i, v in vecs.items()}

    assigned, cents = kmeans_train(df, k=k, iters=3)
    got = {r["id"]: r["cluster"] for r in assigned.collect()}
    ref_assign, ref_cents = _ref_kmeans(f32, k, 3)
    assert got == ref_assign
    assert cents == ref_cents
    # the coinciding-centroid cluster is empty in ROUND 1 (centroid 0
    # wins every tie), so the empty-keeps-previous branch was exercised;
    # the kept centroid may legitimately win points in later rounds
    q1 = {i: [math.floor(float(x) * MICRO + 0.5) for x in v]
          for i, v in f32.items()}
    init = [list(q1[i]) for i in sorted(q1)[:k]]
    first = {i: min((sum((a - b) * (a - b) for a, b in zip(v, c)), cid)
                    for cid, c in enumerate(init))[1] for i, v in q1.items()}
    assert 1 not in set(first.values())

    out = {r["cluster"]: r for r in kmeans_clusters(df, k=k, iters=3).collect()}
    assert sum(r["n_members"] for r in out.values()) == n
    for c, r in out.items():
        assert r["c0"] == ref_cents[c][0]


def test_kmeans_sse_never_increases(spark):
    """Lloyd invariant under the integer contract: total within-cluster
    SSE measured against the round's input centroids is non-increasing."""
    rng = random.Random(42)
    vecs = {i: [rng.uniform(-1, 1) for _ in range(5)] for i in range(60)}
    q = {i: [math.floor(x * MICRO + 0.5) for x in v] for i, v in vecs.items()}

    k = 4
    cents = [list(q[i]) for i in sorted(q)[:k]]
    last = None
    for _ in range(4):
        a = {i: min((sum((x - c) * (x - c) for x, c in zip(v, cc)), cid)
                    for cid, cc in enumerate(cents))[1]
             for i, v in q.items()}
        sse = sum(
            sum((x - c) * (x - c) for x, c in zip(q[i], cents[cl]))
            for i, cl in a.items()
        )
        if last is not None:
            assert sse <= last
        last = sse
        for c in range(k):
            ms = [q[i] for i, cl in a.items() if cl == c]
            if ms:
                cents[c] = [sum(col) // len(ms) for col in zip(*ms)]
