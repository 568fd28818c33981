"""Hashed Naive-Bayes classifier filter: separation on its own training
labels, layout determinism, and the zero-token prior fallback."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from doc_agent_spark.operators import quality_clf
from doc_agent_spark.sources.tables import load


def test_nb_separates_disjoint_vocabularies(spark):
    rows = [
        (i, " ".join(f"alpha{(i + j) % 9}" for j in range(12)), True)
        for i in range(80)
    ] + [
        (100 + i, " ".join(f"beta{(i + j) % 9}" for j in range(12)), False)
        for i in range(80)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, y boolean")
    scored = quality_clf.hashed_nb_scores(df, "doc_id", "text", F.col("y"))
    joined = scored.join(df.select(F.col("doc_id").alias("id"), "y"), "id")
    acc = joined.filter(F.col("nb_pred") == F.col("y")).count() / 160
    assert acc == 1.0  # disjoint vocabularies: self-scored accuracy is perfect


def test_nb_class_means_separate_on_testdata(spark, sf_dir):
    """Testdata docs are near-iid bags from a tiny vocabulary, so accuracy
    on any natural label is weak — but a working model's class-mean scores
    must still order correctly (the filter-threshold property)."""
    from doc_agent_spark.functions.textfns import words_of

    docs = load(spark, sf_dir, "documents")
    ws = words_of(F.col("text"))
    label = (
        F.size(F.filter(ws, lambda x: x == F.lit("spark")))
        > F.size(F.filter(ws, lambda x: x == F.lit("join")))
    )
    scored = quality_clf.hashed_nb_scores(docs, "doc_id", "text", label)
    joined = scored.join(
        docs.select(F.col("doc_id").alias("id"), label.alias("y")), "id"
    )
    means = {
        r.y: r.m
        for r in joined.groupBy("y").agg(F.avg("nb_score").alias("m")).collect()
    }
    assert means[True] > means[False]


def test_nb_layout_deterministic(spark):
    df = spark.createDataFrame(
        [(i, f"word{i % 7} common text body", i % 2 == 0) for i in range(60)],
        "doc_id long, text string, y boolean",
    )
    a = quality_clf.hashed_nb_scores(df, "doc_id", "text", F.col("y"))
    b = quality_clf.hashed_nb_scores(df.repartition(11), "doc_id", "text", F.col("y"))
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_nb_zero_token_doc_gets_prior(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta", True), (2, "gamma delta", False), (3, "", True)],
        "doc_id long, text string, y boolean",
    )
    rows = {
        r.id: r.nb_score
        for r in quality_clf.hashed_nb_scores(df, "doc_id", "text", F.col("y")).collect()
    }
    # doc 3 has no tokens: score is exactly the class prior ln(d_pos/d_neg)
    assert rows[3] == round(math.log(2.0 / 1.0), 6)
