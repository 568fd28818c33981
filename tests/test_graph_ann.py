"""Graph ANN (operators/graph_ann.py) — the HNSW-analog's correctness
contract, since its beam search has no SQL oracle: graph shape invariants,
recall vs exact brute force, self-retrieval, and cross-parallelism
determinism."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from doc_agent_spark.operators import graph_ann, similarity
from doc_agent_spark.sources.tables import load


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def graph(emb):
    return graph_ann.build_knn_graph(emb, m=12, dim=64).cache()


def test_graph_shape(emb, graph):
    rows = graph.collect()
    out_deg: dict[int, int] = {}
    for r in rows:
        assert r.src != r.dst
        assert -1.0 <= r.cosine <= 1.0
        out_deg[r.src] = out_deg.get(r.src, 0) + 1
    assert max(out_deg.values()) <= 12          # top-m cap holds
    n = emb.count()
    assert len(out_deg) > n * 0.9               # nearly every node has edges


def test_recall_vs_brute_force(spark, emb, graph):
    """Mean recall@10 over 5 held-in queries must clear 0.8 — the same bar
    the int8-SQ path is pinned to."""
    hits, total = 0, 0
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    approx = graph_ann.graph_ann_topk(emb, q, k=10, dim=64, graph=graph).collect()
    got = {}
    for r in approx:
        got.setdefault(r.query_id, set()).add(r.id)
    for qid in range(5):
        qv = emb.filter(F.col("vec_id") == qid).collect()[0].embedding
        exact = {r.id for r in similarity.cosine_topk(emb, list(qv), k=10).collect()}
        hits += len(got.get(qid, set()) & exact)
        total += len(exact)
    assert hits / total >= 0.8, f"recall@10 = {hits/total:.2f}"


def test_self_retrieval_tops_the_list(emb, graph):
    q = emb.filter(F.col("vec_id") == 7).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    rows = graph_ann.graph_ann_topk(emb, q, k=3, dim=64, graph=graph).collect()
    top = sorted(rows, key=lambda r: (-r.score, r.id))[0]
    assert top.id == 7 and top.score == pytest.approx(1.0, abs=1e-6)


def test_deterministic_across_query_partitioning(emb, graph):
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    a = sorted(map(tuple, graph_ann.graph_ann_topk(
        emb, q.repartition(1), k=10, dim=64, graph=graph).collect()))
    b = sorted(map(tuple, graph_ann.graph_ann_topk(
        emb, q.repartition(7), k=10, dim=64, graph=graph).collect()))
    assert a == b
