"""End-to-end pipeline driver (jobs/pipeline.py): extract -> bridge ->
curate -> pack + index through one workdir/run-id, then a full resume
pass that must skip every stage's completed work."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from jobs.pipeline import run_pipeline


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    from doc_agent_spark.corpus import make_doc
    from doc_agent_spark.schema import DOCUMENTS_SPANS

    rows = [make_doc(i) for i in range(40)]
    path = str(tmp_path_factory.mktemp("pipe") / "spans")
    spark.createDataFrame(rows, DOCUMENTS_SPANS).write.parquet(path)
    return path


def test_pipeline_all_stages_and_resume(spark, corpus, tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("pipe") / "run")
    stats = run_pipeline(spark, corpus, wd, "p1", buckets=4, shards=2, publish=True)
    assert stats["extract"]["docs_processed"] == 40
    assert stats["bridge"]["docs"] == 40
    assert stats["curate"]["docs_in"] == 40

    docs = spark.read.parquet(f"{wd}/documents")
    assert docs.count() == 40
    assert set(docs.columns) >= {"doc_id", "text", "lang", "source", "n_chars"}
    # provenance axis: docs with media-backed spans are 'scanned', pure
    # text docs 'digital' — both occur in the synthetic corpus
    srcs = {r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert set(srcs) == {"scanned", "digital"} and sum(srcs.values()) == 40

    curated = spark.read.parquet(f"{wd}/curated")
    assert 0 < curated.count() <= 40
    assert spark.read.parquet(f"{wd}/index/bm25_postings").count() > 0
    assert spark.read.parquet(f"{wd}/packed").count() > 0

    # publish (final stage): verified shard export over the curated set
    assert stats["publish"]["complete"] is True
    assert stats["publish"]["verify_failed_shards"] == 0
    assert stats["publish"]["rows_written"] == curated.count()
    assert spark.read.text(f"{wd}/corpus_shards/shard=*").count() == curated.count()

    # resume: everything already committed -> no stage redoes work
    stats2 = run_pipeline(spark, corpus, wd, "p1", buckets=4, shards=2, publish=True)
    assert stats2["extract"]["docs_processed"] == 0
    assert stats2["extract"]["resumed_buckets_skipped"] == 4
    assert stats2["bridge"]["resumed"] is True
    assert stats2["publish"]["shards_written"] == 0
    assert stats2["publish"]["complete"] is True
    assert spark.read.parquet(f"{wd}/curated").count() == curated.count()


def test_pipeline_jsonl_ingest_with_quarantine(spark, tmp_path_factory):
    import os

    from doc_agent_spark.corpus import make_doc

    import json as _json

    d = tmp_path_factory.mktemp("pipej")
    jd = str(d / "drop")
    os.makedirs(jd)
    with open(f"{jd}/docs.jsonl", "w") as f:
        for i in range(20):
            f.write(_json.dumps(make_doc(i)) + "\n")
        # corrupt the drop: a truncated line and a type-mangled line
        f.write('{"doc_id": "doc-x", "spans": [{"kind": tru\n')
        f.write('{"doc_id": 12345, "spans": "not an array"}\n')

    wd = str(d / "run")
    stats = run_pipeline(spark, jd, wd, "pj", buckets=4, shards=2,
                         input_format="jsonl")
    assert stats["ingest"]["docs"] == 20
    assert stats["ingest"]["quarantined"] == 2
    assert stats["extract"]["docs_processed"] == 20
    assert stats["bridge"]["docs"] == 20
    # quarantined raw lines are replayable verbatim
    q = spark.read.json(f"{wd}/quarantine")
    assert q.count() == 2


def test_pipeline_warc_ingest_stage(spark, tmp_path_factory):
    """Stage 0 = WARC archives: clean 200-responses become single-span docs
    keyed by canonical URI (latest record wins a re-crawl), truncated
    records quarantine, and the whole chain runs + resumes behind it."""
    from doc_agent_spark.corpus import make_doc
    from doc_agent_spark.sources import warc as warcsrc

    wdir = tmp_path_factory.mktemp("warcin")
    plain, gz = [], []
    for i in range(24):
        body = "\n".join(
            s["text"] for s in make_doc(i)["spans"] if s.get("text")
        )
        rec = dict(
            uri=f"https://www.Crawl.example.com/inv/{i}?utm_source=x",
            body=body.encode(),
        )
        if i % 2:
            plain.append(warcsrc.make_warc_response(**rec))
        else:
            gz.append(warcsrc.make_warc_response(**rec, gzip_member=True))
    # truncated tail record -> quarantine, not a crash
    trunc = warcsrc.make_warc_response(uri="https://x/bad", body=b"cut")
    warcsrc.write_warc_file(
        str(wdir / "a.warc"),
        [warcsrc.make_warcinfo("a.warc"), *plain, trunc[: len(trunc) - 20]],
    )
    warcsrc.write_warc_file(str(wdir / "b.warc.gz"), gz)
    # re-crawl of inv/1 in a lexically-later file: latest-wins
    warcsrc.write_warc_file(
        str(wdir / "z.warc"),
        [warcsrc.make_warc_response(
            uri="https://crawl.example.com/inv/1", body=b"<html>recrawl</html>"
        )],
    )

    wd = str(tmp_path_factory.mktemp("warcpipe") / "run")
    stats = run_pipeline(
        spark, str(wdir) + "/*.warc*", wd, "pw1", buckets=4, shards=2,
        input_format="warc",
    )
    assert stats["ingest"]["docs"] == 24          # 25 responses, 1 dup URI
    assert stats["ingest"]["quarantined"] == 1
    spans = spark.read.parquet(f"{wd}/spans")
    assert spans.count() == 24
    dup = spans.filter(
        F.col("doc_id") == "https://crawl.example.com/inv/1"
    ).head()
    assert dup["spans"][0]["text"] == "<html>recrawl</html>"
    assert stats["extract"]["docs_processed"] == 24
    assert spark.read.parquet(f"{wd}/documents").count() == 24

    stats2 = run_pipeline(
        spark, str(wdir) + "/*.warc*", wd, "pw1", buckets=4, shards=2,
        input_format="warc",
    )
    assert stats2["ingest"]["resumed"] is True
    assert stats2["extract"]["docs_processed"] == 0
