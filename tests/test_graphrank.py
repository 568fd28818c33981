"""PageRank fixpoint: rank-mass conservation, hub dominance, layout
determinism, and the empty-graph contract."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from doc_agent_spark.operators import graphrank


def _ring_with_hub(spark, n=50):
    nodes = spark.range(n).select("id")
    # ring i -> i+1, plus every node also links to hub 0
    edges = nodes.select(
        F.col("id").alias("src"),
        F.explode(F.array((F.col("id") + 1) % n, F.lit(0).cast("long"))).alias("dst"),
    )
    return nodes, edges


def test_pagerank_mass_conserved_and_hub_dominates(spark):
    nodes, edges = _ring_with_hub(spark)
    pr = {r.id: r.rank for r in graphrank.pagerank(nodes, edges).collect()}
    assert abs(sum(pr.values()) - 1.0) < 1e-6     # no dangling mass
    assert pr[0] == max(pr.values())              # the hub outranks everyone
    assert pr[0] > 5 * min(pr.values())


def test_pagerank_layout_deterministic(spark):
    nodes, edges = _ring_with_hub(spark)
    a = sorted(map(tuple, graphrank.pagerank(nodes, edges).collect()))
    b = sorted(map(tuple, graphrank.pagerank(
        nodes.repartition(7), edges.repartition(9)
    ).collect()))
    assert a == b


def test_pagerank_uniform_on_symmetric_ring(spark):
    n = 30
    nodes = spark.range(n).select("id")
    edges = nodes.select(F.col("id").alias("src"), ((F.col("id") + 1) % n).alias("dst"))
    pr = [r.rank for r in graphrank.pagerank(nodes, edges).collect()]
    assert len(set(pr)) == 1                      # perfect symmetry: equal ranks
    assert abs(pr[0] - 1.0 / n) < 1e-9


def test_pagerank_rejects_empty_nodes(spark):
    empty = spark.range(0).select("id")
    with pytest.raises(ValueError):
        graphrank.pagerank(empty, empty.select(
            F.col("id").alias("src"), F.col("id").alias("dst")
        ))


def test_triangle_counts_hand_graph(spark):
    """K4 on {1,2,3,4} (4 triangles, each node in 3) plus a pendant edge
    (5,6) and an open wedge 7-8, 8-9 (no triangles)."""
    from doc_agent_spark.operators.graphrank import triangle_counts

    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = k4 + [(5, 6), (7, 8), (8, 9)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.id: r.n_triangles for r in triangle_counts(pairs).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_counts_single_triangle(spark):
    from doc_agent_spark.operators.graphrank import triangle_counts

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "id_a long, id_b long")
    got = {r.id: r.n_triangles for r in triangle_counts(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1}
