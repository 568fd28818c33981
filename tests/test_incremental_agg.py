"""Incremental rollup maintenance (operators/incremental_agg.py): merge of
per-batch partial states equals the full recompute exactly, under any merge
order / batch split, and PSI drift (operators/maintenance.py psi_drift)
behaves as a calibrated alarm: exact zero on identical distributions,
positive total on a shift, edge-bucket clamping."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from doc_agent_spark.operators import incremental_agg as ia
from doc_agent_spark.operators import maintenance


def _events(spark):
    rows = [
        # (key, value, batch)
        ("a", 1.25, i % 3) for i in range(9)
    ] + [
        ("b", float(i) + 0.07, i % 3) for i in range(7)
    ] + [
        ("c", -3.5, 0),
        ("c", 10.0, 2),
    ]
    return spark.createDataFrame(rows, "k string, value double, batch int")


def _finalized(df):
    return {
        r.k: (r.n_events, r.sum_value, r.avg_value, r.min_value, r.max_value)
        for r in df.collect()
    }


def test_merge_equals_full_recompute(spark):
    ev = _events(spark)
    full = ia.finalize(ia.rollup_state(ev, ["k"], "value"))
    states = [
        ia.rollup_state(ev.filter(F.col("batch") == i), ["k"], "value")
        for i in range(3)
    ]
    merged = ia.finalize(ia.merge_states(*states))
    assert _finalized(merged) == _finalized(full)


def test_merge_order_invariance(spark):
    ev = _events(spark)
    states = [
        ia.rollup_state(ev.filter(F.col("batch") == i), ["k"], "value")
        for i in range(3)
    ]
    a = _finalized(ia.finalize(ia.merge_states(*states)))
    b = _finalized(ia.finalize(ia.merge_states(states[2], states[0], states[1])))
    # pre-merged pair then the third: the snapshot+delta cadence
    pair = ia.merge_states(states[1], states[2])
    c = _finalized(ia.finalize(ia.merge_states(pair, states[0])))
    assert a == b == c


def test_empty_batch_is_identity(spark):
    ev = _events(spark)
    base = ia.rollup_state(ev, ["k"], "value")
    empty = ia.rollup_state(ev.filter(F.lit(False)), ["k"], "value")
    assert _finalized(ia.finalize(ia.merge_states(base, empty))) == _finalized(
        ia.finalize(base)
    )


def test_multi_key_width(spark):
    ev = _events(spark).withColumn("k2", F.col("batch") % 2)
    full = ia.finalize(ia.rollup_state(ev, ["k", "k2"], "value"))
    states = [
        ia.rollup_state(ev.filter(F.col("batch") == i), ["k", "k2"], "value")
        for i in range(3)
    ]
    merged = ia.finalize(ia.merge_states(*states))
    key = lambda df: {
        (r.k, r.k2): (r.n_events, r.sum_value, r.min_value, r.max_value)
        for r in df.collect()
    }
    assert key(merged) == key(full)


def test_values_exact(spark):
    ev = _events(spark)
    out = _finalized(ia.finalize(ia.rollup_state(ev, ["k"], "value")))
    # a: 9 x 1.25; exact fixed-point arithmetic
    assert out["a"] == (9, 11.25, 1.25, 1.25, 1.25)
    # c: negative min preserved
    n, s, avg, lo, hi = out["c"]
    assert (n, lo, hi) == (2, -3.5, 10.0) and s == 6.5 and avg == 3.25


# ---------------------------------------------------------------------------
# PSI drift
# ---------------------------------------------------------------------------


def _vals(spark, values):
    return spark.createDataFrame([(float(v),) for v in values], "value double")


def test_psi_zero_on_identical(spark):
    vals = [i * 0.9 + 0.05 for i in range(40)]
    out = maintenance.psi_drift(
        _vals(spark, vals), _vals(spark, vals), "value", n_buckets=8, lo=0.0, hi=40.0
    ).collect()
    assert len(out) == 8
    assert all(r.psi_contrib == 0.0 for r in out)  # p == q bit-identical -> exact 0
    assert sum(r.n_ref for r in out) == 40 and sum(r.n_cur for r in out) == 40


def test_psi_positive_on_shift(spark):
    ref = [i * 0.5 for i in range(60)]           # mass in [0, 30)
    cur = [20 + i * 0.3 for i in range(60)]      # shifted up
    out = maintenance.psi_drift(
        _vals(spark, ref), _vals(spark, cur), "value", n_buckets=8, lo=0.0, hi=40.0
    ).collect()
    total = sum(r.psi_contrib for r in out)
    assert total > 0.25  # "investigate" band for a real shift
    assert all(math.isfinite(r.psi_contrib) for r in out)  # smoothing keeps ln finite


def test_psi_clamps_out_of_range(spark):
    out = {
        r.bucket: (r.n_ref, r.n_cur)
        for r in maintenance.psi_drift(
            _vals(spark, [-5.0, 0.0, 99.0]),
            _vals(spark, [1.5]),
            "value",
            n_buckets=4,
            lo=0.0,
            hi=4.0,
        ).collect()
    }
    assert out[0] == (2, 0)   # -5 clamps into bucket 0 alongside 0.0
    assert out[3] == (1, 0)   # 99 clamps into the top bucket
    assert out[1] == (0, 1)
    assert sum(n for n, _ in out.values()) == 3


def test_psi_rejects_bad_range(spark):
    import pytest

    with pytest.raises(ValueError):
        maintenance.psi_drift(_vals(spark, [1.0]), _vals(spark, [1.0]), "value", lo=2.0, hi=2.0)


def test_finalize_guards_exactness_ceiling(spark):
    import pytest

    big = spark.createDataFrame(
        [("k", 2, 2 ** 53 + 2, 1.0, 2.0)],
        "k string, n long, sum_micros long, min_v double, max_v double",
    )
    with pytest.raises(Exception, match="exceeds 2\\^53"):
        ia.finalize(big).collect()
    ok = spark.createDataFrame(
        [("k", 2, 2 ** 53, 1.0, 2.0)],
        "k string, n long, sum_micros long, min_v double, max_v double",
    )
    assert ia.finalize(ok).collect()[0].n_events == 2


def test_finalize_null_sum_passes_through(spark):
    # a key whose values were all NULL: state carries sum_micros NULL;
    # serving row keeps NULL sums instead of raising
    ev = spark.createDataFrame(
        [("k", None), ("k", None), ("j", 2.0)], "k string, value double"
    )
    out = _finalized(ia.finalize(ia.rollup_state(ev, ["k"], "value")))
    assert out["k"] == (2, None, None, None, None)
    assert out["j"] == (1, 2.0, 2.0, 2.0, 2.0)


def test_psi_empty_side_stays_finite(spark):
    # first-crawl shape: an empty current batch (or empty reference) must
    # produce finite contributions (smoothing), not NaN/inf or a crash
    ref = _vals(spark, [float(i) for i in range(20)])
    empty = _vals(spark, []).filter("value > 0")
    for a, b in ((ref, empty), (empty, ref)):
        out = maintenance.psi_drift(a, b, "value", n_buckets=4, lo=0.0, hi=20.0).collect()
        assert len(out) == 4
        assert all(math.isfinite(r.psi_contrib) for r in out)
    # empty-vs-empty: both shares equal the smoothed floor -> exact zero
    out = maintenance.psi_drift(empty, empty, "value", n_buckets=4, lo=0.0, hi=20.0).collect()
    assert all(r.psi_contrib == 0.0 for r in out)
