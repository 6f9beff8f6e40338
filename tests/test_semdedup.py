"""SemDeDup invariants, brute-force checked on a corpus engineered so
clusters, near-dups, and cross-cluster lookalikes all occur."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from doctor_spark.operators.similarity import semdedup


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.default_rng(7)
    rows = []
    vid = 0
    # 6 well-separated cluster cores, each with near-duplicate satellites
    cores = rng.normal(size=(6, 16))
    cores /= np.linalg.norm(cores, axis=1, keepdims=True)
    for c in cores:
        for _ in range(9):
            v = c + rng.normal(scale=0.05, size=16)  # near-dup of core
            rows.append((vid, [float(x) for x in v]))
            vid += 1
        for _ in range(4):
            v = c + rng.normal(scale=0.8, size=16)   # same region, far
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _cos(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 4)


def test_keep_first_semantics_brute_force(emb_df):
    thr = 0.9
    out = semdedup(emb_df, n_clusters=6, threshold=thr, dim=16)
    rows = {r["id"]: (r["cluster"], r["kept"]) for r in out.collect()}
    vecs = {r["vec_id"]: r["embedding"] for r in emb_df.collect()}
    assert set(rows) == set(vecs)
    removed = {i for i, (_c, k) in rows.items() if not k}
    assert removed, "corpus was engineered to contain near-dups"
    for i, (cl, kept) in rows.items():
        smaller_neighbors = [
            j for j, (cj, _kj) in rows.items()
            if cj == cl and j < i and _cos(vecs[i], vecs[j]) >= thr
        ]
        if kept:
            assert not smaller_neighbors, i
        else:
            assert smaller_neighbors, i


def test_cluster_assignment_is_nearest_centroid(emb_df):
    out = semdedup(emb_df, n_clusters=6, threshold=0.99, dim=16)
    rows = out.collect()
    vecs = {r["vec_id"]: np.asarray(r["embedding"]) for r in emb_df.collect()}
    cents = np.array([vecs[i] for i in range(6)])
    cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    for r in rows:
        v = vecs[r["id"]]
        sims = np.round((v / np.linalg.norm(v)) @ cents.T, 12)
        assert int(np.argmax(sims)) == r["cluster"], r["id"]
