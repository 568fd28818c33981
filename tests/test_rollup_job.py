"""Rollup maintenance job (jobs/rollup.py): snapshot N+1 = merge(snapshot N,
batch) equals the full recompute after every batch, duplicate batch ids are
idempotent no-ops, a crash between the snapshot write and the ledger commit
rolls forward, and config drift fails fast."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "jobs"))

from rollup import current_version, run_rollup  # jobs/rollup.py

from doc_agent_spark.operators import incremental_agg as ia

KEYS = ["k"]


def _batch(spark, rows):
    return spark.createDataFrame(rows, "k string, value double")


def _serve_map(spark, path):
    return {
        r.k: (r.n_events, r.sum_value, r.avg_value, r.min_value, r.max_value)
        for r in spark.read.parquet(path).collect()
    }


@pytest.fixture()
def dirs(spark, tmp_path):
    batches = {
        "b1": [("a", 1.5), ("a", 2.0), ("b", -1.0)],
        "b2": [("a", 0.25), ("c", 7.0)],
        "b3": [("b", 4.0), ("c", 1.0), ("c", 2.0)],
    }
    paths = {}
    for bid, rows in batches.items():
        p = str(tmp_path / f"{bid}.parquet")
        _batch(spark, rows).write.parquet(p)
        paths[bid] = p
    return paths, str(tmp_path / "state"), str(tmp_path / "serve"), batches


def test_sequential_batches_equal_full_recompute(spark, dirs):
    paths, state, serve, batches = dirs
    for i, bid in enumerate(["b1", "b2", "b3"], start=1):
        out = run_rollup(spark, paths[bid], state, KEYS, "value", bid,
                         serve_path=serve)
        assert out["version"] == i and not out["skipped"]
        # serving table == one-shot aggregation over every applied batch
        all_rows = [r for b in list(batches)[:i] for r in batches[b]]
        full = ia.finalize(ia.rollup_state(_batch(spark, all_rows), KEYS, "value"))
        expect = {
            r.k: (r.n_events, r.sum_value, r.avg_value, r.min_value, r.max_value)
            for r in full.collect()
        }
        assert _serve_map(spark, serve) == expect
    assert current_version(spark, state) == 3


def test_duplicate_batch_is_noop(spark, dirs):
    paths, state, serve, _ = dirs
    run_rollup(spark, paths["b1"], state, KEYS, "value", "b1", serve_path=serve)
    before = _serve_map(spark, serve)
    out = run_rollup(spark, paths["b1"], state, KEYS, "value", "b1", serve_path=serve)
    assert out["skipped"] and out["version"] == 1 and out["batch_rows"] == 0
    assert _serve_map(spark, serve) == before


def test_crash_before_ledger_commit_rolls_forward(spark, dirs):
    paths, state, serve, batches = dirs
    run_rollup(spark, paths["b1"], state, KEYS, "value", "b1")
    # simulate: b2's snapshot written but the ledger append never happened
    b2_state = ia.merge_states(
        spark.read.parquet(os.path.join(state, "snapshot_v1")),
        ia.rollup_state(_batch(spark, batches["b2"]), KEYS, "value"),
    )
    b2_state.write.mode("overwrite").parquet(os.path.join(state, "snapshot_v2"))
    assert current_version(spark, state) == 1  # orphan dir, uncommitted
    out = run_rollup(spark, paths["b2"], state, KEYS, "value", "b2", serve_path=serve)
    assert out["version"] == 2 and not out["skipped"]
    full = ia.finalize(ia.rollup_state(
        _batch(spark, batches["b1"] + batches["b2"]), KEYS, "value"))
    expect = {
        r.k: (r.n_events, r.sum_value, r.avg_value, r.min_value, r.max_value)
        for r in full.collect()
    }
    assert _serve_map(spark, serve) == expect


def test_config_drift_raises(spark, dirs):
    paths, state, _, _ = dirs
    run_rollup(spark, paths["b1"], state, KEYS, "value", "b1")
    with pytest.raises(ValueError, match="config mismatch"):
        run_rollup(spark, paths["b2"], state, ["k2"], "value", "b2")
    with pytest.raises(ValueError, match="config mismatch"):
        run_rollup(spark, paths["b2"], state, KEYS, "value", "b2", scale=4)


def test_unreadable_ledger_raises_not_resets(spark, dirs):
    paths, state, _, _ = dirs
    run_rollup(spark, paths["b1"], state, KEYS, "value", "b1")
    # torn ledger: a non-parquet file where the ledger dir should be read
    ledger_dir = os.path.join(state, "applied")
    with open(os.path.join(ledger_dir, "part-torn.parquet"), "w") as fh:
        fh.write("not parquet")
    with pytest.raises(Exception, match="unreadable|refusing|PARQUET|Parquet"):
        run_rollup(spark, paths["b2"], state, KEYS, "value", "b2")


def test_failed_first_run_does_not_poison_config(spark, dirs):
    paths, state, serve, _ = dirs
    with pytest.raises(Exception):
        run_rollup(spark, paths["b1"], state, KEYS, "nope_col", "b1")
    # corrected run succeeds: no config was recorded by the failed attempt
    out = run_rollup(spark, paths["b1"], state, KEYS, "value", "b1", serve_path=serve)
    assert out["version"] == 1 and not out["skipped"]


def test_snapshot_retention(spark, dirs):
    paths, state, serve, batches = dirs
    from doc_agent_spark.operators import incremental_agg as ia

    for bid in ["b1", "b2", "b3"]:
        out = run_rollup(spark, paths[bid], state, KEYS, "value", bid,
                         serve_path=serve, retain_last=1)
    assert out["version"] == 3 and out["expired_versions"] == [2]  # v1 gone earlier
    assert not os.path.exists(os.path.join(state, "snapshot_v1"))
    assert not os.path.exists(os.path.join(state, "snapshot_v2"))
    assert os.path.exists(os.path.join(state, "snapshot_v3"))
    # serving values still equal the full recompute — retention never
    # touches the latest snapshot or the ledger
    all_rows = [r for b in batches.values() for r in b]
    full = ia.finalize(ia.rollup_state(
        spark.createDataFrame(all_rows, "k string, value double"), KEYS, "value"))
    expect = {
        r.k: (r.n_events, r.sum_value, r.avg_value, r.min_value, r.max_value)
        for r in full.collect()
    }
    assert _serve_map(spark, serve) == expect
    assert current_version(spark, state) == 3


# ---------------------------------------------------------------------------
# Streaming face: rollup_stream maintains the SAME state directory
# ---------------------------------------------------------------------------


def test_stream_and_batch_share_state(spark, dirs):
    from doc_agent_spark.streaming.pipeline import rollup_stream

    paths, state, serve, batches = dirs
    # batch day 1 applies via the job
    run_rollup(spark, paths["b1"], state, KEYS, "value", "b1")
    # days 2+3 arrive as a stream over the same state dir
    in_dir = os.path.join(os.path.dirname(paths["b2"]), "stream_in")
    os.makedirs(in_dir, exist_ok=True)
    for bid in ("b2", "b3"):
        spark.read.parquet(paths[bid]).write.mode("append").parquet(in_dir)
    stream = spark.readStream.schema("k string, value double").parquet(in_dir)
    q = rollup_stream(
        stream, state, KEYS, "value",
        checkpoint_dir=os.path.join(os.path.dirname(in_dir), "ckpt"),
    )
    done = q.awaitTermination(120)
    if not done:
        q.stop()
    assert done, "stream did not drain within 120s"
    # serving view over the merged state == one-shot recompute of all rows
    from doc_agent_spark.operators import incremental_agg as ia
    from doc_agent_spark.sinks import rollup_state as rs

    snap = rs.latest_snapshot(spark, state)
    got = {
        r.k: (r.n_events, r.sum_value, r.min_value, r.max_value)
        for r in ia.finalize(snap).collect()
    }
    all_rows = [r for b in batches.values() for r in b]
    full = ia.finalize(ia.rollup_state(
        spark.createDataFrame(all_rows, "k string, value double"), KEYS, "value"))
    expect = {
        r.k: (r.n_events, r.sum_value, r.min_value, r.max_value)
        for r in full.collect()
    }
    assert got == expect
    # ledger shows one batch identity + the streaming epochs, all committed
    led = rs.read_ledger(spark, state)
    ids = {r.batch_id for r in led.select("batch_id").collect()}
    assert "b1" in ids and any(i.startswith("epoch-") for i in ids)
    # a RESTARTED stream over the same input/checkpoint replays nothing new
    v_before = rs.current_version(spark, state)
    q2 = rollup_stream(
        spark.readStream.schema("k string, value double").parquet(in_dir),
        state, KEYS, "value",
        checkpoint_dir=os.path.join(os.path.dirname(in_dir), "ckpt"),
    )
    done2 = q2.awaitTermination(120)
    if not done2:
        q2.stop()
    assert done2, "restarted stream did not drain within 120s"
    assert rs.current_version(spark, state) == v_before


def test_duplicate_rerun_with_missing_input_is_pure_noop(spark, dirs):
    paths, state, serve, _ = dirs
    run_rollup(spark, paths["b1"], state, KEYS, "value", "b1", retain_last=5)
    # input retired upstream + a different retain_last: still a true no-op —
    # no input read, no snapshot expiry
    out = run_rollup(
        spark, str(os.path.join(os.path.dirname(paths["b1"]), "gone.parquet")),
        state, KEYS, "value", "b1", retain_last=1,
    )
    assert out["skipped"] and out["version"] == 1
    assert out["expired_versions"] == []


def test_retain_last_zero_raises(spark, dirs):
    paths, state, _, _ = dirs
    with pytest.raises(ValueError, match="retain_last"):
        run_rollup(spark, paths["b1"], state, KEYS, "value", "b1", retain_last=0)
