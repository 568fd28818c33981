"""Named-operation service surface (doc_agent_spark/api.py) — the MCP/REST
shell analog: registry dispatch, param validation, DataFrame results."""

import pytest

from doc_agent_spark import api, corpus
from doc_agent_spark.schema import DOCUMENTS_SPANS


@pytest.fixture(scope="module")
def corpus_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("api") / "docs.parquet")
    spark.createDataFrame(list(corpus.gen_docs(40)), DOCUMENTS_SPANS).write.parquet(p)
    return p


def test_extract_document_operation(spark, corpus_path):
    out = api.execute(spark, "extract_document", input_path=corpus_path)
    rows = out.collect()
    assert len(rows) >= 40
    assert {"doc_id", "order", "kind", "text", "media_ref"} <= set(out.columns)


def test_search_documents_operation(spark, sf_dir):
    out = api.execute(
        spark, "search_documents",
        input_path=f"{sf_dir}/documents.parquet", query="spark join", limit=5,
    )
    rows = out.collect()
    assert 0 < len(rows) <= 5
    assert {"id", "score", "snippet"} == set(out.columns)


def test_param_validation(spark, corpus_path):
    with pytest.raises(KeyError):
        api.execute(spark, "no_such_op")
    with pytest.raises(TypeError):
        api.execute(spark, "search_documents", input_path=corpus_path)  # missing query
    with pytest.raises(TypeError):
        api.execute(spark, "search_documents", input_path=corpus_path,
                    query="x", limit="ten")
    with pytest.raises(TypeError):
        api.execute(spark, "list_documents", input_path=corpus_path, bogus=1)


def test_semantic_search_operation(spark, sf_dir):
    out = api.execute(
        spark, "semantic_search",
        input_path=f"{sf_dir}/documents.parquet", query="spark join window",
        limit=5, words_per_chunk=20,
    )
    rows = out.collect()
    assert len(rows) == 5
    assert {"chunk_id", "doc_id", "chunk_index", "score", "snippet", "doc_lang"} == set(out.columns)
    assert all(r.snippet for r in rows)
