"""Similarity search over embedding columns (SEMANTIC-SEARCH-ROADMAP.md
A3: brute-force cosine top-k; plus an LSH-bucketed ANN scale path).

Brute force is the baseline/oracle: dot products as pure expressions
(JVM, codegen), TakeOrderedAndProject for the top-k — no shuffle beyond
the final k-row gather. The ANN path buckets by sign-random-projection
(functions.vectors.lsh_bucket) so each query only scans its bucket:
candidates ≈ N / 2^planes, the 100 TB-scale strategy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine, lsh_bucket


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, score) of the k nearest by cosine; deterministic tiebreak on id."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = embeddings.select(
        F.col(id_col).alias("id"),
        F.round(cosine(F.col(vec_col), q), 6).alias("score"),
    )
    return scored.orderBy(F.desc("score"), F.asc("id")).limit(k)


def ann_lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
) -> DataFrame:
    """LSH-bucketed approximate top-k: score only the query's bucket."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    with_bucket = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        lsh_bucket(F.col(vec_col), n_planes=n_planes).alias("bucket"),
    )
    qdf = embeddings.sparkSession.range(1).select(
        lsh_bucket(q, n_planes=n_planes).alias("qbucket")
    )
    return (
        with_bucket.join(F.broadcast(qdf), F.col("bucket") == F.col("qbucket"))
        .select("id", F.round(cosine(F.col("v"), q), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("id"))
        .limit(k)
    )


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    centroid_stride: int = 50,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k.

    Cells: a deterministic centroid subset (every ``centroid_stride``-th
    vector — stand-in for a persisted k-means model; the *mechanism* is what
    scales: the centroid set is model-sized, broadcast/inlined, never
    shuffled). Each vector is assigned to its max-cosine centroid as a PURE
    EXPRESSION (array_max over per-centroid score structs — zero shuffle,
    ties to the lower centroid id); the query probes its ``nprobe`` best
    cells and exact-scores only vectors assigned there: candidates ≈
    N * nprobe / n_cells. At 100 TB: partition the vector table BY the cell
    id so a probe prunes partitions at the scan.
    """
    cents = sorted(
        (int(r[0]), list(r[1]))
        for r in embeddings.filter(F.col(id_col) % centroid_stride == 0)
        .select(id_col, vec_col).collect()
    )

    def lit_vec(v):
        return F.array(*[F.lit(float(x)) for x in v])

    def assign_expr(v):
        entries = [
            F.struct(
                cosine(v, lit_vec(cv)).alias("s"), F.lit(-cid).alias("negcid")
            )
            for cid, cv in cents
        ]
        return -F.array_max(F.array(*entries))["negcid"]

    q = [float(x) for x in query_vec]
    probe_scores = sorted(
        ((_cos_py(q, cv), -cid) for cid, cv in cents), reverse=True
    )[:nprobe]
    probed = [-negcid for _s, negcid in probe_scores]

    qcol = lit_vec(q)
    return (
        embeddings.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("v"),
            assign_expr(F.col(vec_col)).alias("cell"),
        )
        .filter(F.col("cell").isin(probed))
        .select("id", F.round(cosine(F.col("v"), qcol), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("id"))
        .limit(k)
    )


def _cos_py(a: list[float], b: list[float]) -> float:
    """Sequential-sum cosine, same fold order as the Spark/DuckDB exprs."""
    dot = na = nb = 0.0
    for x, y in zip(a, b):
        dot += float(x) * float(y)
        na += float(x) * float(x)
        nb += float(y) * float(y)
    return dot / ((na ** 0.5) * (nb ** 0.5))


def knn_join_brute(
    left: DataFrame,
    right: DataFrame,
    k: int = 3,
    left_id: str = "vec_id",
    right_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """k nearest right-rows per left-row (small right side → broadcast)."""
    from pyspark.sql import Window

    l = left.select(F.col(left_id).alias("lid"), F.col(vec_col).alias("lv"))
    r = right.select(F.col(right_id).alias("rid"), F.col(vec_col).alias("rv"))
    scored = l.join(F.broadcast(r)).select(
        "lid", "rid", F.round(cosine(F.col("lv"), F.col("rv")), 6).alias("score")
    )
    w = Window.partitionBy("lid").orderBy(F.desc("score"), F.asc("rid"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
