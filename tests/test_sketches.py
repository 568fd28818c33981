"""KMV distinct sketch: accuracy bound, exact below-k behavior, and the
arrow-partial == relational equivalence that justifies the scale path."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from doc_agent_spark.operators import sketches


def test_kmv_estimate_within_error_bound(spark):
    n = 5000
    df = spark.range(n).select((F.col("id") * 7 + 3).alias("v"))
    r = sketches.kmv_distinct_estimate(df, "v", k=256).collect()[0]
    assert r.k_used == 256
    assert abs(r.estimate - n) / n < 0.25  # ~4 std errors at k=256


def test_kmv_exact_below_k(spark):
    df = spark.range(40).select(F.col("id").alias("v"))
    # duplicates must not inflate the count
    df = df.unionByName(df)
    r = sketches.kmv_distinct_estimate(df, "v", k=256).collect()[0]
    assert (r.k_used, r.estimate) == (40, 40.0)


def test_kmv_arrow_partial_equals_relational(spark):
    df = spark.range(3000).select((F.col("id") % 997).alias("v")).repartition(13)
    a = sketches.kmv_distinct_estimate(df, "v", k=128, arrow_partial=True).collect()[0]
    b = sketches.kmv_distinct_estimate(df, "v", k=128, arrow_partial=False).collect()[0]
    assert tuple(a) == tuple(b)


def test_cms_estimates_upper_bound_exact_counts(spark, sf_dir):
    from doc_agent_spark.operators import sketches

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # width 4 << distinct users: pigeonhole forces collisions in every row
    sk = sketches.cms_sketch(ev, "user_id", depth=4, width=4)
    items = ev.select("user_id").distinct()
    est = sketches.cms_point_estimates(items, sk, "user_id", depth=4, width=4)
    exact = ev.groupBy("user_id").count()
    j = est.join(exact, "user_id")
    # CMS never underestimates; at least one estimate strictly exceeds
    assert j.filter(F.col("cms_est") < F.col("count")).count() == 0
    assert j.filter(F.col("cms_est") > F.col("count")).count() > 0


def test_cms_counter_table_is_bounded_and_mass_conserving(spark, sf_dir):
    from doc_agent_spark.operators import sketches

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sk = sketches.cms_sketch(ev, "user_id", depth=4, width=32).collect()
    assert len(sk) <= 4 * 32
    n = ev.count()
    per_row = {}
    for r in sk:
        per_row[r["row"]] = per_row.get(r["row"], 0) + r["c"]
    assert per_row == {j: n for j in range(4)}  # each row sees every item


def test_cms_absent_probe_estimates_zero(spark):
    from doc_agent_spark.operators import sketches

    df = spark.createDataFrame([("a",), ("b",)], ["v"])
    sk = sketches.cms_sketch(df, "v", depth=4, width=4096)
    probe = spark.createDataFrame([("never-seen-value",)], ["v"])
    est = sketches.cms_point_estimates(probe, sk, "v", depth=4, width=4096)
    assert est.collect()[0]["cms_est"] == 0


def test_cms_sketches_merge_by_adding_counters(spark, sf_dir):
    from doc_agent_spark.operators import sketches

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    merged = (
        sketches.cms_sketch(a, "user_id", 4, 32)
        .unionByName(sketches.cms_sketch(b, "user_id", 4, 32))
        .groupBy("row", "bucket").agg(F.sum("c").alias("c"))
    )
    whole = sketches.cms_sketch(ev, "user_id", 4, 32)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def _texts(spark, ids):
    return spark.createDataFrame(
        [(i, f"document body {i}") for i in ids], "doc_id long, text string"
    )


def test_bloom_no_false_negatives(spark):
    hist = _texts(spark, range(0, 400, 2))
    words = sketches.bloom_build(hist, "text", m_bits=4096, n_hashes=3)
    probed = sketches.bloom_probe(
        hist, words, "doc_id", "text", m_bits=4096, n_hashes=3
    )
    assert probed.filter(~F.col("maybe_seen")).count() == 0


def test_bloom_fp_rate_bounded(spark):
    hist = _texts(spark, range(0, 1000, 2))
    novel = _texts(spark, range(1, 1000, 2))
    words = sketches.bloom_build(hist, "text", m_bits=16384, n_hashes=3)
    probed = sketches.bloom_probe(
        novel, words, "doc_id", "text", m_bits=16384, n_hashes=3
    )
    fp = probed.filter("maybe_seen").count()
    # 500 keys in 16384 bits, k=3: (1-e^(-3*500/16384))^3 ~ 6e-4 -> expect ~0
    assert fp <= 5


def test_bloom_merge_equals_union_build(spark):
    """Filters built per-shard and merged via groupBy(word).bit_or(mask)
    equal the filter built over the union — the mergeability contract."""
    a = _texts(spark, range(0, 100))
    b = _texts(spark, range(100, 200))
    merged = (
        sketches.bloom_build(a, "text", m_bits=2048)
        .unionByName(sketches.bloom_build(b, "text", m_bits=2048))
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("mask"))
    )
    whole = sketches.bloom_build(a.unionByName(b), "text", m_bits=2048)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_bloom_word_table_bounded_and_packed(spark):
    words = sketches.bloom_build(
        _texts(spark, range(3000)), "text", m_bits=1024, n_hashes=3
    ).collect()
    assert len(words) <= 1024 // 32
    assert all(0 <= r.mask < 2**32 for r in words)  # no sign-bit shifts


def test_bloom_randomized_no_false_negatives_and_merge(spark):
    """120 seeded random corpora-slices in one job: every inserted key
    probes true, across assorted m/k settings."""
    import random

    rng = random.Random(7)
    rows = [(i, "".join(rng.choices("abcdefgh", k=rng.randint(3, 12))))
            for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for m_bits, k in ((512, 2), (4096, 3), (65536, 5)):
        words = sketches.bloom_build(df, "text", m_bits=m_bits, n_hashes=k)
        probed = sketches.bloom_probe(
            df, words, "doc_id", "text", m_bits=m_bits, n_hashes=k
        )
        assert probed.filter(~F.col("maybe_seen")).count() == 0, (m_bits, k)


def test_hll_estimate_within_error_bound(spark):
    """m=256 -> relative standard error ~1.04/sqrt(256) = 6.5%; allow 4σ.
    n=20000 distinct is far above the small-range regime so the raw
    estimate applies uncorrected."""
    df = _texts(spark, range(20000))
    row = sketches.hll_distinct_estimate(df, "text").collect()[0]
    assert abs(row.estimate - 20000) / 20000 < 0.26
    assert row.zeros == 0


def test_hll_small_range_correction_driver_side(spark):
    """The data-plane row deliberately omits log-based linear counting
    (libm portability); the documented consumer-side correction recovers
    small cardinalities from the (zeros, estimate) pair."""
    import math

    df = _texts(spark, range(40))
    row = sketches.hll_distinct_estimate(df, "text").collect()[0]
    m = 256
    assert row.zeros > 0 and row.estimate < 2.5 * m
    corrected = m * math.log(m / row.zeros)
    assert abs(corrected - 40) / 40 < 0.25


def test_hll_registers_merge_by_max(spark):
    """Sketch mergeability: registers built over two halves, merged by
    per-bucket max, equal the registers built over the union — the
    cross-partition / cross-snapshot merge contract."""
    lo, hi = _texts(spark, range(0, 5000)), _texts(spark, range(5000, 9000))
    merged = (
        sketches.hll_registers(lo, "text")
        .unionByName(sketches.hll_registers(hi, "text"))
        .groupBy("bucket").agg(F.max("rank").alias("rank"))
    )
    whole = sketches.hll_registers(lo.unionByName(hi), "text")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_hll_register_table_bounded(spark):
    regs = sketches.hll_registers(_texts(spark, range(30000)), "text").collect()
    assert len(regs) <= 256
    assert all(1 <= r.rank <= 53 for r in regs)
