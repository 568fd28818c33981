"""Resumable curation job (jobs/curate.py): funnel correctness, global
dedup exactness under content-hash bucketing, resume parity."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "jobs"))

from pyspark.sql import functions as F

from curate import run_curate  # jobs/curate.py

N = 60


@pytest.fixture(scope="module")
def docs_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("curate") / "docs.parquet")
    rows = []
    for i in range(N):
        text = (
            f"the quick document number {i} talks about the data and the "
            f"pipeline with plenty of the usual english filler words " * 3
        )
        rows.append((i, text, "en", f"src{i % 3}", len(text)))
    # exact dups of docs 0-9 under new ids (must dedup across buckets)
    for i in range(10):
        base = rows[i]
        rows.append((1000 + i, base[1], base[2], base[3], base[4]))
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ), p


@pytest.fixture(scope="module")
def curated(spark, docs_path, tmp_path_factory):
    df, _ = docs_path
    d = tmp_path_factory.mktemp("curate_out")
    in_p = str(d / "in.parquet")
    df.write.parquet(in_p)
    out, lin, met = (str(d / x) for x in ("out", "lineage", "metrics"))
    stats = run_curate(
        spark, in_p, out, lin, met, run_id="c1", buckets=8,
        min_quality=0.1, langs=["en"], sample_fraction=1.0,
    )
    return stats, out, lin, met, in_p


def test_funnel_counts(curated):
    stats, *_ = curated
    assert stats["docs_in"] == N + 10
    assert stats["after_dedup"] == N          # the 10 copies dropped
    assert stats["kept"] == stats["after_filters"]  # fraction 1.0


def test_dedup_is_globally_exact(spark, curated):
    _, out, *_ = curated
    texts = [r.text for r in spark.read.parquet(out).select("text").collect()]
    assert len(texts) == len(set(texts))


def test_output_is_redacted_and_scored(spark, curated):
    _, out, *_ = curated
    df = spark.read.parquet(out)
    assert {"quality", "pred_lang", "text_md5"} <= set(df.columns)
    assert df.filter(F.col("quality") < 0.1).count() == 0


def test_all_filtered_buckets_still_marked_done(spark, docs_path, tmp_path_factory):
    """A bucket whose docs are ALL filtered out writes no output partition,
    but must still get a lineage row (docs_out=0) — otherwise every resume
    re-processes it forever. docs_in must record the bucket's true input
    count, not the kept count."""
    df, _ = docs_path
    d = tmp_path_factory.mktemp("curate_empty")
    in_p = str(d / "in.parquet")
    df.write.parquet(in_p)
    out, lin, met = (str(d / x) for x in ("out", "lineage", "metrics"))
    r1 = run_curate(
        spark, in_p, out, lin, met, run_id="ce", buckets=8,
        min_quality=1.1,  # impossible bar: every doc filtered out
    )
    assert r1["kept"] == 0 and r1["docs_in"] == N + 10
    lineage = spark.read.parquet(lin)
    assert lineage.count() == 8                       # every bucket marked done
    assert lineage.agg(F.sum("docs_in")).collect()[0][0] == N + 10
    assert lineage.agg(F.sum("docs_out")).collect()[0][0] == 0
    r2 = run_curate(
        spark, in_p, out, lin, met, run_id="ce", buckets=8, min_quality=1.1,
    )
    assert r2["resumed_buckets_skipped"] == 8 and r2["docs_in"] == 0


def test_resume_skips_completed_buckets(spark, curated):
    stats, out, lin, met, in_p = curated
    r2 = run_curate(
        spark, in_p, out, lin, met, run_id="c1", buckets=8,
        min_quality=0.1, langs=["en"], sample_fraction=1.0,
    )
    assert r2["resumed_buckets_skipped"] == 8
    assert r2["docs_in"] == 0
    # output unchanged after the no-op resume
    assert spark.read.parquet(out).count() == stats["kept"]
