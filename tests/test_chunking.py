"""Chunking operator (operators/chunking.py): the reference's
Chunk{id, documentId, content, index} data model with line / sentence /
fixed-window strategies, plus the chunk→document hydration join."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from doc_agent_spark.operators import chunking


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "para one alpha\n\npara two beta\n \n\npara three gamma"),
        (2, "Hello world. How are you? All good! trailing bit"),
        (3, "one two three four five six seven"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _chunks(df, **kw):
    out = chunking.chunk_documents(df, **kw).collect()
    return {(r.doc_id, r.chunk_index): r for r in out}


def test_line_strategy_groups_blank_lines(docs):
    c = _chunks(docs.filter(F.col("doc_id") == 1), strategy="line")
    contents = [c[(1, i)].content for i in range(3)]
    assert contents == ["para one alpha", "para two beta", "para three gamma"]


def test_sentence_strategy_splits_on_terminators(docs):
    c = _chunks(docs.filter(F.col("doc_id") == 2), strategy="sentence")
    contents = [c[(2, i)].content for i in range(4)]
    assert contents == ["Hello world.", "How are you?", "All good!", "trailing bit"]


def test_semantic_windows_cover_all_words(docs):
    c = _chunks(docs.filter(F.col("doc_id") == 3), strategy="semantic", words_per_chunk=3)
    contents = [c[(3, i)].content for i in range(3)]
    assert contents == ["one two three", "four five six", "seven"]


def test_chunk_ids_deterministic_and_unique(docs):
    out1 = chunking.chunk_documents(docs, strategy="semantic", words_per_chunk=3)
    out2 = chunking.chunk_documents(docs, strategy="semantic", words_per_chunk=3)
    ids1 = sorted(r.chunk_id for r in out1.collect())
    ids2 = sorted(r.chunk_id for r in out2.collect())
    assert ids1 == ids2
    assert len(ids1) == len(set(ids1))


def test_chunking_plan_is_narrow(docs):
    plan = (
        chunking.chunk_documents(docs, strategy="line")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # chunking = projection + generate, no shuffle
    assert "Python" not in plan


def test_hydrate_chunks_joins_doc_metadata(spark, docs):
    docs_meta = docs.withColumn("lang", F.lit("en"))
    chunks = chunking.chunk_documents(docs_meta, strategy="semantic", words_per_chunk=3)
    results = chunks.select(F.col("chunk_id").alias("id")).limit(2).withColumn(
        "score", F.lit(1.0)
    )
    out = chunking.hydrate_chunks(results, chunks, docs_meta).collect()
    assert len(out) == 2
    assert all(r.doc_lang == "en" and r.snippet for r in out)
