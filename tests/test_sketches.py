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


def _ovl(spark, a_range, b_range, k=256):
    a = spark.range(*a_range).select(F.col("id").alias("v"))
    b = spark.range(*b_range).select(F.col("id").alias("v"))
    rows = {r.op: r for r in
            sketches.kmv_overlap_estimate(a, b, "v", k=k).collect()}
    return rows["union"], rows["intersection"]


def test_kmv_overlap_exact_below_k(spark):
    """Union of 60 + 50 with 20 shared < k: every number is exact."""
    u, i = _ovl(spark, (0, 60), (40, 90))
    assert (u.n, u.est) == (90, 90.0)
    assert (i.n, i.est) == (20, 20.0)
    assert i.aux == pytest.approx(20 / 90, abs=1e-6)


def test_kmv_overlap_identical_and_disjoint(spark):
    """A==B gives Jaccard 1 and inter_est == union_est; disjoint sets
    give zero intersection — at any k, sketched or exact."""
    u, i = _ovl(spark, (0, 5000), (0, 5000), k=128)
    assert i.aux == pytest.approx(1.0)
    assert i.est == u.est
    u2, i2 = _ovl(spark, (0, 5000), (5000, 10000), k=128)
    assert (i2.n, i2.est) == (0, 0.0)


def test_kmv_overlap_estimates_within_error_bound(spark):
    """50% overlap of two 6000-element sets: union 9000, inter 3000,
    Jaccard 1/3 — the ρ-estimator lands within ~4σ of each."""
    u, i = _ovl(spark, (0, 6000), (3000, 9000))
    assert abs(u.est - 9000) / 9000 < 0.25
    assert abs(i.est - 3000) / 3000 < 0.4
    assert abs(i.aux - 1 / 3) < 0.12


def test_kmv_overlap_partial_truncation_lossless(spark):
    """The per-side arrow k-min reduction changes nothing: membership of
    every union-k-min hash survives both sides' truncation."""
    a = spark.range(4000).select((F.col("id") % 2017).alias("v")).repartition(11)
    b = spark.range(4000).select(((F.col("id") % 1511) + 1000).alias("v")).repartition(7)
    fast = sketches.kmv_overlap_estimate(a, b, "v", k=128, arrow_partial=True)
    slow = sketches.kmv_overlap_estimate(a, b, "v", k=128, arrow_partial=False)
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, slow.collect()))


def test_hash_sample_quantiles_exact_when_group_fits(spark):
    """m >= group size: the sample IS the group, so the estimate equals
    the exact interpolated quantile."""
    df = spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") % 2).cast("string").alias("g"),
        F.col("id").cast("double").alias("x"),
    )
    est = sketches.hash_sample_quantiles(
        df, "x", "k", "g", m=1000, quantiles=(0.5, 0.9)
    )
    exact = df.groupBy("g").agg(
        F.round(F.percentile("x", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("x", F.lit(0.9)), 6).alias("p90"),
    )
    assert sorted(map(tuple, est.collect())) == sorted(map(tuple, exact.collect()))


def test_hash_sample_quantiles_layout_invariant_and_close(spark):
    """The bottom-m hash sample ignores partitioning/order (content hash,
    no RNG) and tracks the true quantiles of a uniform column."""
    df = spark.range(20000).select(
        F.col("id").alias("k"),
        F.lit("g").alias("g"),
        ((F.col("id") * 48271) % 100003).cast("double").alias("x"),
    )
    a = sketches.hash_sample_quantiles(df.repartition(3), "x", "k", "g", m=256)
    b = sketches.hash_sample_quantiles(
        df.repartition(17, "x").sortWithinPartitions("x"), "x", "k", "g", m=256)
    ra, rb = a.collect()[0], b.collect()[0]
    assert tuple(ra) == tuple(rb)
    assert abs(ra.p50 - 50000) / 50000 < 0.15
    assert abs(ra.p90 - 90000) / 90000 < 0.15


def test_kmv_null_values_ignored(spark):
    """NULLs must not steal limit-k slots (Spark sorts NULL first; DuckDB
    last) — count-distinct semantics ignore NULL in both engines."""
    import duckdb

    # string column: toPandas keeps None as None (a nullable long would
    # become float64 — '5' vs '5.0' hash inputs across engines)
    df = spark.createDataFrame(
        [(str(i),) for i in range(30)] + [(None,)] * 5, "v string")
    for arrow in (True, False):
        r = sketches.kmv_distinct_estimate(df, "v", k=16, arrow_partial=arrow).collect()[0]
        assert r.k_used == 16 and r.estimate > 0
    con = duckdb.connect()
    con.register("t", df.toPandas())
    duck = con.execute(sketches.kmv_sql("v", k=16).format(table="t")).fetchall()[0]
    got = sketches.kmv_distinct_estimate(df, "v", k=16).collect()[0]
    assert (got.k_used, got.kth_hash, got.estimate) == duck


def test_kmv_overlap_null_values_ignored(spark):
    a = spark.createDataFrame([(i,) for i in range(20)] + [(None,)], "v long")
    b = spark.createDataFrame([(i,) for i in range(10, 30)] + [(None,)], "v long")
    rows = {r.op: r for r in sketches.kmv_overlap_estimate(a, b, "v", k=64).collect()}
    assert rows["union"].est == 30.0      # exact below k, NULLs excluded
    assert rows["intersection"].n == 10
