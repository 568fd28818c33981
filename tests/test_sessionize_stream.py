"""Custom stateful streaming operator: event-time sessionization via
applyInPandasWithState (streaming/pipeline.sessionize_stream).

Sessions close two ways; both are covered:
- inline: a >30-min gap WITHIN the observed data closes the earlier session
- event-time timeout: the watermark passing last_ts+gap closes the session

The file-source stream is driven with maxFilesPerTrigger=1 so the two input
files become two micro-batches: batch 2's late-hour events advance the
watermark past batch 1's sessions, firing their timeouts deterministically.
"""

from __future__ import annotations

import datetime as dt

import pytest

from doc_agent_spark.streaming.pipeline import sessionize_stream

SCHEMA = "user_id long, ts timestamp, value double"


def _t(minute, hour=10):
    return dt.datetime(2024, 1, 1, hour, minute)


@pytest.fixture(scope="module")
def session_rows(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("sess")
    in_dir, ckpt = str(d / "in"), str(d / "ckpt")
    # batch 1: user 1 has two sessions separated by a 40-min inline gap;
    # user 2 has one session
    spark.createDataFrame(
        [
            (1, _t(0), 1.0), (1, _t(10), 2.0),       # session A: 10:00-10:10
            (1, _t(50), 4.0),                        # 40-min gap → session B opens
            (2, _t(5), 10.0), (2, _t(6), 10.0),      # user 2 session
        ],
        SCHEMA,
    ).coalesce(1).write.mode("overwrite").parquet(in_dir + "/b1")
    # batch 2: far-future event advances the watermark (2h delay) past
    # everything above → open sessions time out and emit
    spark.createDataFrame([(3, _t(0, hour=20), 0.5)], SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(in_dir + "/b2")

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir + "/*")
    )
    q = (
        sessionize_stream(stream, watermark="2 hours")
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.sql("SELECT * FROM sessions").collect()


@pytest.fixture(scope="module")
def ooo_rows(spark, tmp_path_factory):
    """Out-of-order events in a SECOND micro-batch (within the 2h watermark
    but older than the state's last_ts) — rows.sort() can't fix these."""
    d = tmp_path_factory.mktemp("ooo")
    in_dir, ckpt = str(d / "in"), str(d / "ckpt")
    # batch 1: user 5 open session 10:00-10:10; user 6 open session 10:00
    spark.createDataFrame(
        [(5, _t(0), 1.0), (5, _t(10), 2.0), (6, _t(0), 1.0),
         (7, _t(0), 1.0), (7, _t(10), 2.0)], SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(in_dir + "/b1")
    # batch 2 (all within the 2h watermark of batch 1's 10:10 max):
    # - user 5 at 9:55: older than last_ts but within gap of session_start
    #   → must MERGE, extending session_start back to 9:55 (not regress
    #   session_end to 9:55 — the round-1 bug)
    # - user 6 at 8:30+8:35: stragglers > gap before the open session
    #   → their own coalesced session
    # - user 7 at 9:05 + 9:31: 9:05 tests as a straggler against the
    #   as-of-that-row session start (10:00), but 9:31 then extends the
    #   open session back to 9:31 — leaving the "straggler" within gap of
    #   the final start: ONE session 9:05-10:10, not a spurious split
    # - user 3 far-future: advances watermark → timeouts fire
    spark.createDataFrame(
        [
            (5, _t(55, hour=9), 4.0),
            (6, _t(30, hour=8), 0.25), (6, _t(35, hour=8), 0.25),
            (7, _t(5, hour=9), 4.0), (7, _t(31, hour=9), 8.0),
            (3, _t(0, hour=20), 0.5),
        ],
        SCHEMA,
    ).coalesce(1).write.mode("overwrite").parquet(in_dir + "/b2")

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir + "/*")
    )
    q = (
        sessionize_stream(stream, watermark="2 hours")
        .writeStream.format("memory")
        .queryName("ooo_sessions")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.sql("SELECT * FROM ooo_sessions").collect()


def test_out_of_order_merge_extends_start_not_end(ooo_rows):
    u5 = [r for r in ooo_rows if r.user_id == 5]
    assert len(u5) == 1
    s = u5[0]
    assert (s.session_start, s.session_end) == (_t(55, hour=9), _t(10))
    assert (s.n_events, s.sum_value) == (3, 7.0)


def test_straggler_older_than_gap_becomes_own_session(ooo_rows):
    u6 = sorted([r for r in ooo_rows if r.user_id == 6], key=lambda r: r.session_start)
    assert [(r.session_start, r.session_end, r.n_events, r.sum_value) for r in u6] == [
        (_t(30, hour=8), _t(35, hour=8), 2, 0.5),
        (_t(0), _t(0), 1, 1.0),
    ]


def test_straggler_bridged_by_backward_merge_is_one_session(ooo_rows):
    """A row that tested as older-than-gap against the session start AS OF
    its processing can end up within gap of the FINAL start after later
    in-batch rows extend the session backward — it must merge, not emit a
    spurious split (9:05 straggler + 9:31 merge + 10:00-10:10 state =
    one session)."""
    u7 = [r for r in ooo_rows if r.user_id == 7]
    assert len(u7) == 1
    s = u7[0]
    assert (s.session_start, s.session_end) == (_t(5, hour=9), _t(10))
    assert (s.n_events, s.sum_value) == (4, 15.0)


def test_inline_gap_closes_first_session(session_rows):
    u1 = sorted(
        [r for r in session_rows if r.user_id == 1], key=lambda r: r.session_start
    )
    assert len(u1) >= 1
    a = u1[0]
    assert (a.session_start, a.session_end) == (_t(0), _t(10))
    assert (a.n_events, a.sum_value) == (2, 3.0)


def test_timeout_closes_open_sessions(session_rows):
    # user 1 session B (single event at 10:50) and user 2's session can only
    # close via the event-time timeout fired by batch 2's watermark advance
    u1 = sorted(
        [r for r in session_rows if r.user_id == 1], key=lambda r: r.session_start
    )
    assert len(u1) == 2
    b = u1[1]
    assert (b.session_start, b.session_end, b.n_events, b.sum_value) == (
        _t(50), _t(50), 1, 4.0,
    )
    u2 = [r for r in session_rows if r.user_id == 2]
    assert len(u2) == 1
    assert (u2[0].session_start, u2[0].session_end, u2[0].n_events, u2[0].sum_value) == (
        _t(5), _t(6), 2, 20.0,
    )
