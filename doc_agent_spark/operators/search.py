"""Keyword + hybrid search (the reference's designed-but-unbuilt search
subsystem, SEMANTIC-SEARCH-ROADMAP.md:104-135): BM25 term scoring and
Reciprocal-Rank-Fusion of two ranked lists.

BM25 is classic explode → agg → join: DF from groupBy(term), TF from
groupBy(doc, term); the tiny per-term DF table broadcasts into the TF join,
so the only real shuffle is the TF aggregation (partial map-side combine).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.textfns import words_of


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(id, score) BM25 over the shared tokenizer, query terms fixed.

    idf = ln(1 + (N - df + 0.5)/(df + 0.5)); standard Robertson form.
    """
    toks = docs.select(
        F.col(id_col).alias("id"), words_of(F.col(text_col)).alias("w")
    ).withColumn("dl", F.size("w"))
    n_docs_avgdl = toks.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    )
    tf = (
        toks.select("id", "dl", F.explode("w").alias("term"))
        .where(F.col("term").isin(query_terms))
        .groupBy("id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.countDistinct("id").alias("df"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(F.broadcast(n_docs_avgdl))
        .withColumn(
            "idf",
            F.log(F.lit(1.0) + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
    )
    return scored.groupBy("id").agg(F.round(F.sum("term_score"), 6).alias("score"))


def hydrate(results: DataFrame, docs: DataFrame, id_col: str = "doc_id",
            text_col: str = "text", snippet_len: int = 80) -> DataFrame:
    """J1/J3 hydration join (SEMANTIC-SEARCH-ROADMAP.md:41,91-98): attach
    document text snippets to ranked (id, score) results. The result set is
    k rows → broadcast it into the big documents table so hydration is a
    map-side join (no shuffle of the corpus)."""
    d = docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("_t"))
    return (
        d.join(F.broadcast(results), "id")
        .select("id", "score", F.substring("_t", 1, snippet_len).alias("snippet"))
    )


def eval_retrieval(retrieved: DataFrame, relevant: DataFrame, k: int = 10) -> DataFrame:
    """A5 eval metrics (SEMANTIC-SEARCH-ROADMAP.md:506-511): recall@k,
    precision@k, MRR for one ranked result list.

    ``retrieved``: (id, score) — ranked by score desc, id asc; ``relevant``:
    (id). Metrics computed with a rank window + left join against the
    (broadcast) relevant set; returns ONE row (recall_at_k, precision_at_k,
    mrr). Per-query grouping at scale = same plan with a query_id in every
    partitionBy/groupBy.
    """
    w = Window.orderBy(F.desc("score"), F.asc("id"))
    ranked = retrieved.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
    rel = relevant.select(F.col("id").alias("rid")).withColumn("hit", F.lit(1))
    n_rel = relevant.count()
    joined = ranked.join(F.broadcast(rel), ranked.id == rel.rid, "left")
    return joined.agg(
        F.round(F.sum(F.coalesce("hit", F.lit(0))) / F.lit(float(n_rel)), 6).alias("recall_at_k"),
        F.round(F.sum(F.coalesce("hit", F.lit(0))) / F.lit(float(k)), 6).alias("precision_at_k"),
        F.round(
            F.coalesce(F.lit(1.0) / F.min(F.when(F.col("hit") == 1, F.col("rank"))), F.lit(0.0)),
            6,
        ).alias("mrr"),
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    k: int = 60,
) -> DataFrame:
    """Reciprocal Rank Fusion (roadmap :130-135): full-outer on id,
    score = Σ 1/(k + rank); missing list contributes 0.

    Inputs: (id, score) frames; ranks derived per-list by score desc, id asc.
    """
    def ranked(df: DataFrame, name: str) -> DataFrame:
        w = Window.orderBy(F.desc("score"), F.asc("id"))
        return df.select("id", F.row_number().over(w).alias(name))

    a = ranked(ranked_a, "rank_a")
    b = ranked(ranked_b, "rank_b")
    return (
        a.join(b, "id", "full_outer")
        .select(
            "id",
            F.round(
                F.coalesce(1.0 / (F.lit(k) + F.col("rank_a")), F.lit(0.0))
                + F.coalesce(1.0 / (F.lit(k) + F.col("rank_b")), F.lit(0.0)),
                6,
            ).alias("rrf_score"),
        )
    )
