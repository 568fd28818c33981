"""Incremental near-dup ingest job (jobs/incremental.py): batch-vs-history
and batch-internal drops, kept-only bands delta, artifact-granular resume,
and the union-merge contract for snapshot N+1's index."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "jobs"))

from incremental import run_incremental

from doc_agent_spark.operators import dedup

BASE = ("the quarterly report shows the revenue number and the cost "
        "number for the data pipeline team in the usual format")
OTHER = ("completely unrelated english words about some other topic "
         "entirely with no overlap in the shingle space at all")
THIRD = ("a third body of text discussing the architecture of the "
         "spark engine and the iceberg tables it writes every day")


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _setup(spark, d):
    history = _docs(spark, [(0, BASE), (2, OTHER)])
    hist_p = str(d / "history.parquet")
    history.write.parquet(hist_p)
    # index snapshot: just the band table artifact this job consumes
    idx = str(d / "index")
    dedup.minhash_band_table(history).write.parquet(idx + "/minhash_bands")
    batch = _docs(spark, [
        (10, BASE.replace("usual", "updated")),     # near-dup of history 0
        (11, THIRD),                                # near-dup pair with 12
        (12, THIRD.replace("every day", "each day")),
        (13, "fresh unique content that matches nothing else at all here"),
    ])
    batch_p = str(d / "batch.parquet")
    batch.write.parquet(batch_p)
    return hist_p, idx, batch_p


def test_incremental_drops_and_delta(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("inc")
    hist_p, idx, batch_p = _setup(spark, d)
    out, lin = str(d / "delta"), str(d / "lineage")
    r = run_incremental(
        spark, batch_p, hist_p, idx, out, lin, run_id="i1", jaccard=0.5
    )
    assert r["batch_docs"] == 4
    pairs = spark.read.parquet(out + "/pairs_delta").collect()
    kinds = {(p.id_new, p.matched_id): p.kind for p in pairs}
    assert kinds[(10, 0)] == "history"
    assert kinds[(11, 12)] == "batch"
    # history match drops the new doc (history is canonical); the batch
    # cluster {11,12} keeps its min id
    drops = {r.doc_id for r in spark.read.parquet(out + "/drop_delta").collect()}
    assert drops == {10, 12}
    kept_band_ids = {
        r.id for r in spark.read.parquet(out + "/bands_delta").select("id").distinct().collect()
    }
    assert kept_band_ids == {11, 13}

    # snapshot N+1 = history index ∪ delta bands: a re-crawl of doc 11's
    # text must now find 11 through the MERGED index
    merged = spark.read.parquet(idx + "/minhash_bands").unionByName(
        spark.read.parquet(out + "/bands_delta")
    )
    probe = dedup.minhash_band_table(_docs(spark, [(99, THIRD)]))
    hits = {
        r.id
        for r in probe.select("band", "bucket")
        .join(merged, ["band", "bucket"])
        .select("id").distinct().collect()
    }
    assert 11 in hits and 12 not in hits

    # resume: identical second run reuses every artifact
    r2 = run_incremental(
        spark, batch_p, hist_p, idx, out, lin, run_id="i2", jaccard=0.5
    )
    assert r2["artifacts_reused"] == 3
    assert r2["dropped"] == r["dropped"] == 2


def test_incremental_partial_artifact_rebuilds(spark, tmp_path_factory):
    """Crash-resume contract: an artifact directory that exists but does
    not read back as parquet (crash mid-write) is rebuilt identically;
    committed artifacts upstream of it are still reused."""
    d = tmp_path_factory.mktemp("inc_crash")
    hist_p, idx, batch_p = _setup(spark, d)
    out, lin = str(d / "delta"), str(d / "lineage")
    r1 = run_incremental(
        spark, batch_p, hist_p, idx, out, lin, run_id="c1", jaccard=0.5
    )
    # simulate a crash that corrupted the LAST artifact
    import shutil

    shutil.rmtree(out + "/bands_delta")
    os.makedirs(out + "/bands_delta")  # exists, but unreadable as parquet
    r2 = run_incremental(
        spark, batch_p, hist_p, idx, out, lin, run_id="c2", jaccard=0.5
    )
    assert r2["reused"] == {
        "pairs_delta": True, "drop_delta": True, "bands_delta": False
    }
    assert r2["bands_delta"] == r1["bands_delta"]
    assert {
        x.id for x in spark.read.parquet(out + "/bands_delta").select("id").distinct().collect()
    } == {11, 13}


def test_incremental_no_matches(spark, tmp_path_factory):
    """A batch with no near-dups anywhere: empty pairs/drops, full bands."""
    d = tmp_path_factory.mktemp("inc_clean")
    hist_p, idx, _ = _setup(spark, d)
    batch = _docs(spark, [
        (20, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    ])
    batch_p = str(d / "clean_batch.parquet")
    batch.write.parquet(batch_p)
    out, lin = str(d / "delta2"), str(d / "lineage2")
    r = run_incremental(
        spark, batch_p, hist_p, idx, out, lin, run_id="i3", jaccard=0.5
    )
    assert r["pairs_delta"] == 0
    assert r["dropped"] == 0
    assert {
        x.id for x in spark.read.parquet(out + "/bands_delta").select("id").distinct().collect()
    } == {20}
