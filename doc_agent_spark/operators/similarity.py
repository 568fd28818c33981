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
    """IVF (inverted-file) approximate top-k, fully relational.

    Cells: a deterministic centroid subset (every ``centroid_stride``-th
    vector — stand-in for a persisted k-means codebook). The codebook stays
    a DATAFRAME and broadcasts into every stage — never ``.collect()``-ed
    into literal expression trees (the round-1 weakness: a realistic
    4k-64k-cell codebook inlined as literals is a multi-hundred-MB Catalyst
    tree). Only the single query vector is a literal.

    Plan: (1) assignment — broadcast-nested-loop vector×centroid cosine,
    then ``max_by`` argmax per vector (map-side partial agg; ties to the
    lower centroid id); (2) probe — the query's ``nprobe`` best cells via
    TakeOrderedAndProject over the codebook; (3) candidates = assignment
    ⋈ probe (BroadcastHashJoin), ≈ N·nprobe/n_cells ids, broadcast back
    into the vector table (BroadcastHashJoin) so exact scoring touches only
    probed cells. At 100 TB the assignment runs ONCE at index-build time
    and the table is written partitioned BY cell, so a probe prunes at the
    scan; the query-time tree is identical minus stage (1).
    """
    cents = embeddings.filter(F.col(id_col) % centroid_stride == 0).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cv")
    )
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])

    pairs = (
        embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .join(F.broadcast(cents))
        .select("id", "cid", cosine(F.col("v"), F.col("cv")).alias("cs"))
    )
    assigned = pairs.groupBy("id").agg(
        F.max_by(
            "cid", F.struct(F.col("cs"), (-F.col("cid")).alias("neg"))
        ).alias("cell")
    )
    probe = (
        cents.select("cid", cosine(F.col("cv"), qcol).alias("qs"))
        .orderBy(F.desc("qs"), F.asc("cid"))
        .limit(nprobe)
        .select(F.col("cid").alias("pcid"))
    )
    cand = assigned.join(
        F.broadcast(probe), F.col("cell") == F.col("pcid")
    ).select("id")
    emb = embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    return (
        emb.join(F.broadcast(cand), "id")
        .select("id", F.round(cosine(F.col("v"), qcol), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("id"))
        .limit(k)
    )


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
