"""Temporal joins (operators/temporal.py): as-of semantics (latest
prior-or-equal, tie visibility, unmatched nulls) and binned range join
(boundary inclusivity, bin-crossing intervals), plus plan shape."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from doc_agent_spark.operators import temporal


def _t(minute, hour=10):
    return dt.datetime(2024, 1, 1, hour, minute)


@pytest.fixture(scope="module")
def asof_frames(spark):
    left = spark.createDataFrame(
        [(1, 7, _t(5), 1.0), (2, 7, _t(10), 2.0), (3, 7, _t(2), 3.0), (4, 9, _t(30), 4.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    right = spark.createDataFrame(
        [(7, _t(3), 30.0), (7, _t(10), 100.0), (8, _t(1), 80.0)],
        "user_id long, ts timestamp, value double",
    )
    return left, right


def test_asof_latest_prior_or_equal(spark, asof_frames):
    left, right = asof_frames
    out = {r.event_id: (r.matched_ts, r.matched_value)
           for r in temporal.asof_join(left, right).collect()}
    assert out[1] == (_t(3), 30.0)       # latest right at/before 10:05
    assert out[2] == (_t(10), 100.0)     # equal-instant right IS visible
    assert out[3] == (None, None)        # no right at/before 10:02
    assert out[4] == (None, None)        # user 9 has no rights at all


def test_asof_plan_has_no_inequality_join(spark, asof_frames):
    left, right = asof_frames
    plan = (
        temporal.asof_join(left, right)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan  # the union+window formulation


def test_range_join_binned_boundaries_and_bin_crossing(spark):
    points = spark.createDataFrame(
        [(1, _t(0)), (2, _t(30)), (3, _t(45)), (4, _t(46)), (5, _t(15, hour=12))],
        "event_id long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        # 10:00-10:45 (inclusive both ends) and one crossing the hour bin
        [(100, _t(0), _t(45)), (200, _t(50), _t(20, hour=11))],
        "interval_id long, start_ts timestamp, end_ts timestamp",
    )
    out = {(r.event_id, r.interval_id)
           for r in temporal.range_join_binned(points, intervals).collect()}
    assert out == {(1, 100), (2, 100), (3, 100)}  # 4 is 1 min past end; 5 in no interval
    plan = (
        temporal.range_join_binned(points, intervals)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_scd2_intervals_change_compression_and_chain(spark):
    """Updates 1.0, 1.0, 2.0, 2.0, 1.0 collapse to three versions whose
    intervals chain exactly (each valid_to = next valid_from; last open)."""
    upd = spark.createDataFrame(
        [(7, _t(0), 1.0), (7, _t(5), 1.0), (7, _t(10), 2.0),
         (7, _t(15), 2.0), (7, _t(20), 1.0), (9, _t(3), 5.0)],
        "user_id long, ts timestamp, value double",
    )
    rows = sorted(
        temporal.scd2_intervals(upd).collect(),
        key=lambda r: (r.user_id, r.version),
    )
    u7 = [r for r in rows if r.user_id == 7]
    assert [(r.version, r.value) for r in u7] == [(1, 1.0), (2, 2.0), (3, 1.0)]
    assert [r.valid_from for r in u7] == [_t(0), _t(10), _t(20)]
    assert [r.valid_to for r in u7] == [_t(10), _t(20), None]
    u9 = [r for r in rows if r.user_id == 9]
    assert [(r.version, r.valid_to) for r in u9] == [(1, None)]


def test_scd2_no_dedupe_keeps_every_update(spark):
    upd = spark.createDataFrame(
        [(7, _t(0), 1.0), (7, _t(5), 1.0)],
        "user_id long, ts timestamp, value double",
    )
    rows = temporal.scd2_intervals(upd, dedupe_unchanged=False).collect()
    assert len(rows) == 2


def test_scd2_null_value_transitions(spark):
    """NULL→1.0 and 1.0→NULL are changes; NULL→NULL is not (IS DISTINCT
    FROM semantics, matching the DuckDB oracle)."""
    upd = spark.createDataFrame(
        [(7, _t(0), None), (7, _t(5), None), (7, _t(10), 1.0), (7, _t(15), None)],
        "user_id long, ts timestamp, value double",
    )
    rows = sorted(temporal.scd2_intervals(upd).collect(), key=lambda r: r.version)
    assert [(r.version, r.value) for r in rows] == [(1, None), (2, 1.0), (3, None)]


def test_scd2_snapshot_governing_version(spark):
    upd = spark.createDataFrame(
        [(7, _t(0), 1.0), (7, _t(10), 2.0), (9, _t(20), 9.0)],
        "user_id long, ts timestamp, value double",
    )
    hist = temporal.scd2_intervals(upd)
    snap = {
        r.user_id: r.value
        for r in temporal.scd2_snapshot(hist, F.lit(_t(12)).cast("timestamp")).collect()
    }
    assert snap == {7: 2.0}  # user 9's first version starts later


def test_scd2_single_exchange(spark):
    """All three window passes share one hash exchange on the key."""
    upd = spark.createDataFrame(
        [(7, _t(0), 1.0), (7, _t(10), 2.0)],
        "user_id long, ts timestamp, value double",
    )
    plan = (
        temporal.scd2_intervals(upd)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
