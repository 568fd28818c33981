"""Link-graph ranking: PageRank as a bounded-round relational fixpoint.

Why it belongs in a training-data engine: web-scale curation weighs hosts
by link-graph centrality (Common Crawl publishes host-level rank files;
quality pipelines use them as a crawl prior and a quality feature). The
iteration is the third fixpoint family in the repo after min-label and
star-contraction connected components (operators/dedup.py) — same
execution discipline: materialize the loop-invariant edge frame once,
localCheckpoint each round's ranks so the DAG never re-executes the whole
history (the measured dup_clusters lesson: O(iterations) re-execution of
the generator was a 15× wall hit).

Scale shape per round: one equi-join (ranks ⋈ edges on src — shuffle keyed
on node ids) + one partial-aggregated groupBy(dst). Rounds are FIXED
(``iters``), not run to convergence: a deterministic, engine-portable
truncation — the DuckDB oracle unrolls the identical rounds as chained
CTEs and reproduces every double bit-for-bit (the only rounding is the
final round(…, 9), absorbing sum-order drift in the per-dst contribution
sums, the repo's standard tolerance discipline).

IEEE parity notes: the teleport term is computed as ``(1.0 - damping) /
N`` in BOTH engines (never the pre-folded literal — ``1 - 0.85`` is
0.15000000000000002 in binary64, which a hand-written ``0.15`` would NOT
match); contributions divide by the long outdegree exactly as the SQL
mirror does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    iters: int = 8,
) -> DataFrame:
    """``(id, rank)`` after ``iters`` synchronous PageRank rounds.

    Every node needs at least one out-edge (no dangling-mass handling —
    the weaved gate graph guarantees it; a production run adds the
    standard dangling redistribution term)."""
    n = nodes.count()
    if n == 0:
        raise ValueError("pagerank needs a non-empty node set")
    teleport = (1.0 - damping) / n
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .join(
            edges.groupBy(F.col(src_col).alias("src"))
            .agg(F.count(F.lit(1)).alias("outdeg")),
            "src",
        )
        .localCheckpoint(eager=True)  # loop-invariant: pay the scan once
    )
    ids = nodes.select(F.col(id_col).alias("id"))
    ranks = ids.select("id", F.lit(1.0 / n).alias("r"))
    for _ in range(iters):
        contrib = (
            e.join(ranks, e.src == ranks.id)
            .select(F.col("dst").alias("id"), (F.col("r") / F.col("outdeg")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            ids.join(contrib, "id", "left")
            .select(
                "id",
                (F.lit(teleport) + F.lit(damping) * F.coalesce("s", F.lit(0.0))).alias("r"),
            )
            .localCheckpoint(eager=True)  # cut per-round lineage
        )
    return ranks.select("id", F.round("r", 9).alias("rank"))


def pagerank_sql(
    nodes_sql: str,
    edges_sql: str,
    id_expr: str = "id",
    damping: float = 0.85,
    iters: int = 8,
) -> str:
    """DuckDB mirror: the same rounds unrolled as chained CTEs; returns a
    full SELECT yielding (id, rank)."""
    parts = [
        f"nodes AS ({nodes_sql})",
        f"e0 AS ({edges_sql})",
        "od AS (SELECT src, count(*) AS outdeg FROM e0 GROUP BY 1)",
        "ed AS (SELECT e0.src, e0.dst, od.outdeg FROM e0 JOIN od USING (src))",
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes)",
        f"r0 AS (SELECT {id_expr} AS id, 1.0 / nn.n AS r FROM nodes CROSS JOIN nn)",
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"""r{t} AS (
  SELECT nodes_t.id,
         (1.0 - {damping!r}) / nn.n
           + {damping!r} * coalesce(c.s, 0.0) AS r
  FROM (SELECT {id_expr} AS id FROM nodes) nodes_t
  CROSS JOIN nn
  LEFT JOIN (SELECT dst AS id, sum(r / outdeg) AS s
             FROM ed JOIN r{t - 1} ON ed.src = r{t - 1}.id
             GROUP BY dst) c ON nodes_t.id = c.id)"""
        )
    ctes = ",\n".join(parts)
    return f"WITH {ctes}\nSELECT id, round(r, 9) AS rank FROM r{iters}"


def triangle_counts(pairs: DataFrame, a: str = "id_a", b: str = "id_b") -> DataFrame:
    """Per-node triangle counts over an undirected graph given as ordered
    edge pairs (``a < b``) — the clustering-coefficient / k-truss support
    primitive: a doc whose near-dup edges close into triangles sits in a
    dense template cluster, not a chance collision (edge-confidence signal
    the pairwise LSH verify can't see).

    Node-iterator with orientation: each triangle a<b<c is generated
    EXACTLY once by joining edge (a,b) against (b,c) and closing with
    (a,c) — two equi-joins, no DISTINCT pass, wedge mass bounded by the
    orientation (the classic trick; at extreme scale orient by
    (degree, id) instead of raw id so Zipfian hubs don't anchor the
    quadratic wedge side). Returns (id, n_triangles).
    """
    e1 = pairs.select(F.col(a).alias("a"), F.col(b).alias("b"))
    e2 = pairs.select(F.col(a).alias("b"), F.col(b).alias("c"))
    e3 = pairs.select(F.col(a).alias("a"), F.col(b).alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    nodes = (
        tri.select(F.col("a").alias("id"))
        .unionAll(tri.select(F.col("b").alias("id")))
        .unionAll(tri.select(F.col("c").alias("id")))
    )
    return nodes.groupBy("id").agg(F.count(F.lit(1)).alias("n_triangles"))
