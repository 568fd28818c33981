"""SemDeDup-style semantic dedup (dedup.semdedup_drops): IVF-cell
cluster-then-prune over embeddings. Correctness pins: the drop rule
("similar to ANY lower-id cell-mate") against a brute-force per-cell
reference, keep_id = smallest qualifying partner, cell-boundary blindness
(a cross-cell near-dup is NOT dropped — SemDeDup's own documented trade),
and survivors are exactly corpus minus drops.
"""
from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from doc_agent_spark.operators import dedup
from doc_agent_spark.operators.similarity import ivf_assign, ivf_codebook


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _brute_drops(emb_rows, cells, threshold):
    """Reference implementation: per cell, drop any id with a lower-id
    cell-mate at rounded cosine ≥ threshold; keep = smallest such."""
    by_cell: dict[int, list] = {}
    for r in emb_rows:
        by_cell.setdefault(cells[r.vec_id], []).append(
            (r.vec_id, np.asarray(r.embedding, dtype=np.float64))
        )
    out = {}
    for members in by_cell.values():
        members.sort()
        for j, (jid, jv) in enumerate(members):
            for iid, iv in members[:j]:
                c = float(jv @ iv / (np.linalg.norm(jv) * np.linalg.norm(iv)))
                if round(c, 6) >= threshold:
                    out[jid] = (iid, round(c, 6))
                    break
    return out


def test_matches_brute_force_per_cell(spark, emb):
    thr = 0.4
    _cents, bc = ivf_codebook(emb, centroid_stride=50)
    cells = {
        r.id: r.cell for r in ivf_assign(emb, bc).collect()
    }
    expect = _brute_drops(emb.collect(), cells, thr)
    got = {
        r.drop_id: (r.keep_id, r.cosine)
        for r in dedup.semdedup_drops(emb, threshold=thr, centroid_stride=50).collect()
    }
    assert set(got) == set(expect)
    for d, (k, _c) in expect.items():
        assert got[d][0] == k, f"drop {d}: keep {got[d][0]} != brute {k}"


def test_cross_cell_pairs_survive(spark):
    """Two identical vectors forced into different cells must BOTH survive
    — the clustering bound is a recall trade, not a bug, and the op must
    not silently do all-pairs work across cells."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),    # centroid of cell 0 (stride 2 ⇒ cids {0, 2})
        (2, [0.0, 1.0, 0.0, 0.0]),    # centroid of cell 2
        # members sit FAR from their centroids (cos 0.6 / 0.5, below the
        # 0.8 threshold) but NEAR each other (cos ≈ 0.862) — yet they land
        # in different cells, so neither may be dropped
        (5, [0.6, 0.0, 0.8, 0.0]),    # cell 0 (cos c0=0.6 > c2=0.0)
        (7, [0.45, 0.5, 0.74, 0.0]),  # cell 2 (cos c2≈0.5 > c0≈0.45)
    ]
    emb = _mk(rows)
    drops = dedup.semdedup_drops(emb, threshold=0.8, centroid_stride=2).collect()
    dropped = {r.drop_id for r in drops}
    assert 5 not in dropped and 7 not in dropped
    # the same near-dup INSIDE one cell: the later id is dropped
    rows2 = rows + [(9, [0.6, 0.0, 0.8, 0.0])]  # exact copy of 5, same cell
    drops2 = {r.drop_id: r.keep_id for r in dedup.semdedup_drops(
        _mk(rows2), threshold=0.8, centroid_stride=2).collect()}
    assert drops2.get(9) == 5


def _mk(rows):
    import tests.conftest  # noqa: F401  (spark fixture owns the session)
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>",
    )


def test_survivors_are_corpus_minus_drops(spark, emb):
    drops = dedup.semdedup_drops(emb, threshold=0.4, centroid_stride=50)
    n_total = emb.count()
    n_drops = drops.count()
    survivors = emb.join(
        drops.select(F.col("drop_id").alias("vec_id")), "vec_id", "left_anti"
    ).count()
    assert survivors == n_total - n_drops
    # a drop row's keeper must itself never be dropped by a HIGHER id —
    # keep_id < drop_id always (the greedy keeps earliest)
    assert drops.filter(F.col("keep_id") >= F.col("drop_id")).count() == 0


def test_semdedup_string_ids(spark):
    """The curate path emits string doc ids — semdedup must route through
    the hash-key codebook guards, not crash on `id % stride`."""
    rows = [
        (f"doc-{i:04d}", [((i * 7 + j * 13) % 17 - 8) / 8.0 for j in range(8)])
        for i in range(40)
    ]
    rows.append(("doc-9999", rows[0][1]))  # exact-vector dup of doc-0000
    emb = spark.createDataFrame(rows, "doc_id string, embedding array<double>")
    drops = dedup.semdedup_drops(
        emb, threshold=0.99, centroid_stride=10,
        id_col="doc_id", vec_col="embedding",
    ).collect()
    assert any(r.drop_id == "doc-9999" for r in drops)
