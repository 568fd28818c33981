"""Distributed Lloyd k-means codebook training (similarity.kmeans_fit):
numpy-reference equality, cross-parallelism determinism, and the
ivf_codebook consumer contract."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from doc_agent_spark.operators import similarity


def _vectors(n=40, dim=4, seed=7):
    rng = np.random.RandomState(seed)
    return rng.rand(n, dim).astype(np.float32)


@pytest.fixture(scope="module")
def emb(spark):
    V = _vectors()
    rows = [(i, [float(x) for x in V[i]]) for i in range(len(V))]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _numpy_kmeans(V, stride=10, iters=2):
    V = V.astype(np.float64)
    cids = np.arange(0, len(V), stride)
    M = V[cids].copy()

    def norm(m):
        return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-300)

    for _ in range(iters):
        a = np.argmax(V @ norm(M).T, axis=1)
        newM = M.copy()
        for ci in range(len(cids)):
            sel = V[a == ci]
            if len(sel):
                newM[ci] = np.round(sel.mean(axis=0), 6)
        M = newM
    final = np.argmax(V @ norm(M).T, axis=1)
    return cids, M, cids[final]


def test_matches_numpy_reference(spark, emb):
    V = _vectors()
    cids_ref, M_ref, assign_ref = _numpy_kmeans(V)
    cents, bc = similarity.kmeans_fit(emb, iters=2, centroid_stride=10)
    got = {r["cid"]: np.array(r["cv"]) for r in cents.collect()}
    assert sorted(got) == list(cids_ref)
    for i, cid in enumerate(cids_ref):
        assert got[cid] == pytest.approx(M_ref[i], abs=1e-9)
    a = {
        r["id"]: r["cell"]
        for r in similarity.ivf_assign(emb, bc, id_col="vec_id").collect()
    }
    assert a == {i: int(c) for i, c in enumerate(assign_ref)}


def test_deterministic_across_parallelism(spark, emb):
    outs = []
    for parts in (1, 13):
        cents, bc = similarity.kmeans_fit(
            emb.repartition(parts), iters=2, centroid_stride=10
        )
        outs.append(sorted((r["cid"], tuple(r["cv"])) for r in cents.collect()))
    assert outs[0] == outs[1]


def test_trained_codebook_feeds_ivf_consumers(spark, sf_dir):
    from doc_agent_spark.sources.tables import load

    embr = load(spark, sf_dir, "embeddings")
    cents, bc = similarity.kmeans_fit(embr, iters=1, centroid_stride=50)
    assert cents.columns == ["cid", "cv"]
    assigned = similarity.ivf_assign(embr, bc, id_col="vec_id")
    n = embr.count()
    assert assigned.count() == n  # every vector lands in exactly one cell
    cells = {r["cid"] for r in cents.collect()}
    got_cells = {r["cell"] for r in assigned.select("cell").distinct().collect()}
    assert got_cells <= cells


def test_empty_cell_keeps_previous_centroid(spark):
    # two far clusters + seeds at ids 0 and 3; seed 3's cell goes empty when
    # every vector is closer (cosine) to seed 0's direction
    rows = [
        (0, [1.0, 0.0]), (1, [0.99, 0.01]), (2, [0.98, 0.02]),
        (3, [0.97, 0.03]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents, _ = similarity.kmeans_fit(df, iters=2, centroid_stride=3)
    got = {r["cid"]: r["cv"] for r in cents.collect()}
    assert set(got) == {0, 3}
    # seed 3 attracted nothing new or kept a finite centroid either way
    assert all(np.isfinite(got[3]))
