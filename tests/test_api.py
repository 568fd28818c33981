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
    # punctuated queries tokenize like the documents do (words_of: split on
    # non-alphanumerics) — "spark-join?" must hit the same docs as "spark join"
    punct = api.execute(
        spark, "search_documents",
        input_path=f"{sf_dir}/documents.parquet", query="spark-join?", limit=5,
    ).collect()
    assert [(r.id, r.score) for r in punct] == [(r.id, r.score) for r in rows]


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


def test_format_bytes_matches_reference_goldens(spark):
    """F15 goldens from formatBytes (extract.ts:34-39): 1024 thresholds,
    toFixed(1), integer bytes under 1 KB."""
    from pyspark.sql import functions as F

    from doc_agent_spark.functions.format import format_bytes

    cases = [
        (0, "0 B"), (512, "512 B"), (1023, "1023 B"),
        (1024, "1.0 KB"), (1536, "1.5 KB"), (10239, "10.0 KB"),
        (1048576, "1.0 MB"), (5767168, "5.5 MB"),
        (1073741824, "1.0 GB"), (3972844749, "3.7 GB"),
        # toFixed(1) stays positional far past 1e7 GB — a double→string cast
        # would emit scientific notation here and break parity
        (1.2e16, "11175870.9 GB"), (1e19, "9313225746.2 GB"),
    ]
    df = spark.createDataFrame([(float(b),) for b, _ in cases], "b double")
    got = [r.h for r in df.select(format_bytes(F.col("b")).alias("h"))
           .orderBy("b").collect()]
    assert got == [h for _, h in sorted(cases)]


def test_capability_containment_rule(spark):
    """P5 (ollama.ts:137-146): installed name matches when it CONTAINS the
    requested string."""
    installed = ["llama3.2:latest", "qwen2.5vl:7b"]
    assert api.capability_available(installed, "llama3.2")
    assert api.capability_available(installed, "qwen2.5vl:7b")
    assert not api.capability_available(installed, "mistral")


def test_preflight(spark, corpus_path, tmp_path):
    ok = api.preflight(spark, "extract_document", corpus_path)
    assert ok["ok"] and ok["input_readable"] and not ok["missing_columns"]
    # spans-only corpus lacks the text column search needs
    bad = api.preflight(spark, "search_documents", corpus_path)
    assert not bad["ok"] and bad["missing_columns"] == ["text"]
    assert not api.preflight(spark, "no_such_op", corpus_path)["operation_known"]
    unread = api.preflight(spark, "list_documents", str(tmp_path / "missing"))
    assert not unread["ok"] and not unread["input_readable"]


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


def test_evaluate_dataset_scopes_and_zero_match_query(spark, tmp_path):
    """`doc eval --dataset` analog: batched retrieval + per-query /
    per-category / overall metric rows; a query matching nothing still
    reports (zeros), and the overall row macro-averages the per-query
    rows."""
    from doc_agent_spark import api

    ds_path = str(tmp_path / "evalds.parquet")
    spark.createDataFrame(
        [(0, "spark join", [1, 2, 3], "invoices"),
         (1, "window scan", [4], "invoices"),
         (2, "zzzznotaword", [5], "receipts")],
        "query_id long, query string, relevant_ids array<long>, category string",
    ).write.parquet(ds_path)
    out = api.execute(
        spark, "evaluate_dataset",
        input_path="/root/testdata/sf0.001/documents.parquet",
        dataset_path=ds_path, limit=10,
    ).collect()
    rows = {}
    for r in out:
        rows.setdefault(r["scope"], []).append(r)
    assert len(rows["query"]) == 3
    q = {r["query_id"]: r for r in rows["query"]}
    assert q[2]["recall_at_k"] == 0.0 and q[2]["mrr"] == 0.0  # no-match query
    assert len(rows["overall"]) == 1
    ov = rows["overall"][0]
    import pytest as _pt
    assert ov["mrr"] == _pt.approx(
        round(sum(r["mrr"] for r in rows["query"]) / 3, 6))
    cats = {r["category"]: r for r in rows["category"]}
    assert set(cats) == {"invoices", "receipts"}
    assert cats["receipts"]["recall_at_k"] == 0.0


def test_search_modes_and_filter(spark):
    """Roadmap search options: --mode vector|keyword|hybrid and
    --filter key:value. The hybrid list fuses both rankings (RRF), and a
    filter restricts the corpus before retrieval; unknown modes/columns
    fail fast."""
    import pytest as _pt

    from doc_agent_spark import api

    docs = "/root/testdata/sf0.001/documents.parquet"
    kw = api.execute(spark, "search_documents", input_path=docs,
                     query="spark join", limit=5).collect()
    vec = api.execute(spark, "search_documents", input_path=docs,
                      query="spark join", limit=5, mode="vector").collect()
    hyb = api.execute(spark, "search_documents", input_path=docs,
                      query="spark join", limit=5, mode="hybrid").collect()
    assert len(kw) == 5 and len(vec) == 5 and len(hyb) == 5
    # hybrid scores are RRF masses (bounded by 2/61), not BM25 scores
    assert all(r["score"] <= 2.0 / 61 + 1e-9 for r in hyb)
    flt = api.execute(spark, "search_documents", input_path=docs,
                      query="spark join", limit=100,
                      filter="lang:en").collect()
    langs = {r["id"] for r in flt}
    en_ids = {r["doc_id"] for r in spark.read.parquet(docs)
              .filter("lang = 'en'").collect()}
    assert langs and langs <= en_ids
    with _pt.raises(ValueError, match="unknown mode"):
        api.execute(spark, "search_documents", input_path=docs,
                    query="x", mode="psychic")
    with _pt.raises(ValueError, match="unknown filter column"):
        api.execute(spark, "search_documents", input_path=docs,
                    query="x", filter="nope:1")


def test_evaluate_dataset_compare_providers(spark, tmp_path):
    """`doc eval --compare a,b`: one macro-averaged vector-eval row per
    named provider, each a DIFFERENT deterministic embedding space (the
    default space is untouched — existing oracle arms pin it)."""
    from doc_agent_spark import api
    from doc_agent_spark.functions import embedder
    from pyspark.sql import functions as F

    ds_path = str(tmp_path / "cmpds.parquet")
    spark.createDataFrame(
        [(0, "spark join", [1, 2], "a"), (1, "window scan", [3], "b")],
        "query_id long, query string, relevant_ids array<long>, category string",
    ).write.parquet(ds_path)
    out = api.execute(
        spark, "evaluate_dataset",
        input_path="/root/testdata/sf0.001/documents.parquet",
        dataset_path=ds_path, limit=10, compare="ollama,openai",
    ).collect()
    provs = {r["category"]: r for r in out if r["scope"] == "provider"}
    assert set(provs) == {"ollama", "openai"}
    # distinct provider salts -> distinct embedding spaces
    base = spark.range(1).select(
        embedder.fake_embedding(F.lit("x"), 4).alias("e"),
        embedder.fake_embedding(F.lit("x"), 4, "ollama").alias("eo"),
    ).head()
    assert base["e"] != base["eo"]


def test_search_rerank_flag(spark):
    from doc_agent_spark import api

    docs = "/root/testdata/sf0.001/documents.parquet"
    rows = api.execute(spark, "search_documents", input_path=docs,
                       query="spark join window", limit=5,
                       rerank=True).collect()
    assert len(rows) == 5
    assert {"retrieval_score", "rerank_score", "final_score",
            "snippet"} <= set(rows[0].asDict())
    scores = [r["final_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(r["final_score"] is not None for r in rows)
