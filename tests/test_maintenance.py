"""Compaction planner: group sizes approximate the target, eligibility
rules (right-sized files and lone small files excluded), determinism."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from doc_agent_spark.operators import maintenance


def _manifest(spark):
    rows = (
        [("p0", i, 100) for i in range(10)]         # 10 small files
        + [("p0", 100, 5000)]                        # right-sized, excluded
        + [("p1", i, 400) for i in range(3)]         # 3 smalls
        + [("p2", 0, 50)]                            # lone small, excluded
    )
    return spark.createDataFrame(rows, "partition string, file_id long, bytes long")


def test_plan_groups_and_eligibility(spark):
    plan = maintenance.plan_compaction(_manifest(spark), target_bytes=1000)
    rows = plan.collect()
    assert all(r.partition in ("p0", "p1") for r in rows)       # p2 lone file out
    assert all(r.file_id != 100 for r in rows)                  # >= target out
    groups = {}
    for r in rows:
        groups.setdefault((r.partition, r.group_id), []).append(r.bytes)
    # every group's total is <= target + one file of slack (the cut rule)
    for (_, _), sizes in groups.items():
        assert sum(sizes) <= 1000 + max(sizes)
    # p0: 10 x 100 bytes -> cumulative cut at 1000 => exactly one full group
    p0_groups = {g for (p, g) in groups if p == "p0"}
    assert p0_groups == {0}
    # p1: 3 x 400 -> cum 400,800,1200 -> groups floor(0/1000),floor(400/1000),floor(800/1000) = 0,0,0
    p1_groups = {g for (p, g) in groups if p == "p1"}
    assert p1_groups == {0}


def test_plan_deterministic_under_layout(spark):
    m = _manifest(spark)
    a = maintenance.plan_compaction(m, target_bytes=700).collect()
    b = maintenance.plan_compaction(m.repartition(7), target_bytes=700).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_plan_rejects_bad_target(spark):
    with pytest.raises(ValueError):
        maintenance.plan_compaction(_manifest(spark), target_bytes=0)


def test_profile_table_stats(spark):
    df = spark.createDataFrame(
        [(1, "aa", None), (2, "bb", 5.0), (3, "aa", 7.0), (4, None, 7.0)],
        "id long, s string, v double",
    )
    rows = {r.col_name: r for r in maintenance.profile_table(df, ["id", "s", "v"]).collect()}
    assert (rows["id"].n_nonnull, rows["id"].n_distinct) == (4, 4.0)
    assert (rows["s"].n_nonnull, rows["s"].n_distinct) == (3, 2.0)
    assert (rows["v"].n_nonnull, rows["v"].n_distinct) == (3, 2.0)
    assert rows["s"].avg_len == 2.0


def test_salted_join_matches_plain_join(spark):
    from doc_agent_spark.plans import skew

    big = spark.createDataFrame(
        [(i, "hot" if i % 3 else f"k{i % 5}") for i in range(300)],
        "row_id long, key string",
    )
    small = spark.createDataFrame(
        [("hot", 1.0), ("k1", 2.0), ("k4", 3.0), ("unmatched", 9.0)],
        "key string, w double",
    )
    plain = big.join(small, "key").select("row_id", "key", "w")
    salted = skew.salted_join(big, small, ["key"], row_key="row_id").select(
        "row_id", "key", "w"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    # left join keeps unmatched big rows exactly once
    plain_l = big.join(small, "key", "left")
    salted_l = skew.salted_join(big, small, ["key"], row_key="row_id", how="left")
    assert plain_l.count() == salted_l.count() == 300
    # the hot key's big rows spread across several salt values
    import pyspark.sql.functions as F
    n_salts_used = (
        big.filter(F.col("key") == "hot")
        .withColumn("_salt", F.pmod(F.hash(F.col("row_id"), F.lit(11)), F.lit(8)))
        .select("_salt").distinct().count()
    )
    assert n_salts_used > 1


def test_salted_join_rejects_right_joins(spark):
    from doc_agent_spark.plans import skew

    df = spark.createDataFrame([(1, "a")], "row_id long, key string")
    with pytest.raises(ValueError):
        skew.salted_join(df, df, ["key"], row_key="row_id", how="right")


def _skewed_frames(spark):
    # 70% of big rows share one key; the tail is uniform over 20 keys
    big = spark.createDataFrame(
        [
            (i, "mega" if i % 10 < 7 else f"k{i % 20}", float(i))
            for i in range(1000)
        ]
        + [(9999, None, -1.0)],
        "row_id long, key string, payload double",
    )
    small = spark.createDataFrame(
        [("mega", 1.0)] + [(f"k{i}", float(i)) for i in range(15)],
        "key string, w double",
    )
    return big, small


def test_heavy_keys_detects_the_hot_key(spark):
    from doc_agent_spark.plans import skew

    big, _ = _skewed_frames(spark)
    hot = skew.heavy_keys(big, "key", row_key="row_id",
                          threshold_share=0.3, sample_fraction=0.5)
    assert hot == ["mega"]
    # threshold above the hot share -> nothing detected
    assert skew.heavy_keys(big, "key", row_key="row_id",
                           threshold_share=0.95, sample_fraction=0.5) == []


def test_skewed_split_join_matches_plain_join(spark):
    from doc_agent_spark.plans import skew

    big, small = _skewed_frames(spark)
    cols = ["row_id", "key", "payload", "w"]
    for how in ("inner", "left"):
        plain = big.join(small, ["key"], how).select(*cols)
        # explicit hot list
        split = skew.skewed_split_join(
            big, small, ["key"], row_key="row_id", hot_keys=["mega"], how=how
        ).select(*cols)
        assert sorted(map(tuple, plain.collect())) == sorted(
            map(tuple, split.collect())
        ), how
        # auto-detected hot list
        auto = skew.skewed_split_join(
            big, small, ["key"], row_key="row_id", how=how,
            threshold_share=0.3, sample_fraction=0.5,
        ).select(*cols)
        assert sorted(map(tuple, plain.collect())) == sorted(
            map(tuple, auto.collect())
        ), how
    # left join keeps the null-key big row exactly once
    left = skew.skewed_split_join(
        big, small, ["key"], row_key="row_id", hot_keys=["mega"], how="left"
    )
    assert left.filter("key IS NULL").count() == 1


def test_skewed_split_join_contract(spark):
    from doc_agent_spark.plans import skew

    df = spark.createDataFrame([(1, "a", "b")], "row_id long, k1 string, k2 string")
    with pytest.raises(ValueError):
        skew.skewed_split_join(df, df, ["k1", "k2"], row_key="row_id")
    with pytest.raises(ValueError):
        skew.skewed_split_join(df, df, ["k1"], row_key="row_id", how="right")
    # no hot keys at all -> falls back to the plain join
    big, small = _skewed_frames(spark)
    out = skew.skewed_split_join(
        big, small, ["key"], row_key="row_id", hot_keys=[]
    )
    assert out.count() == big.join(small, ["key"]).count()


def test_zorder_key_golden_and_range(spark):
    """Hand-computed Morton values + 16-bit truncation."""
    import pyspark.sql.functions as F

    from doc_agent_spark.operators import maintenance

    df = spark.createDataFrame(
        [(0, 0), (3, 5), (65535, 65535), (65536 + 3, 5), (1, 0), (0, 1)],
        "x long, y long",
    )
    got = [
        r.z for r in df.select(
            maintenance.zorder_key(F.col("x"), F.col("y")).alias("z")
        ).collect()
    ]
    # (3,5): x bits at even positions = 0b010101 & x-spread -> 5; y -> 34
    assert got == [0, 39, (1 << 32) - 1, 39, 1, 2]


def test_zorder_clustering_prunes_both_dimensions(spark):
    """The property the layout exists for, measured as min/max file-stat
    pruning: for a point predicate on ONE column, how many of the 16
    files overlap (must be scanned)? The x-sorted layout is perfect for x
    (1 file) but useless for y (all 16); the Z-layout serves BOTH at ~4 —
    the summed scan cost over an even x/y predicate mix is far lower."""
    import pyspark.sql.functions as F

    from doc_agent_spark.operators import maintenance

    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )

    def files_touched(df, col):
        # a file must be read for value v iff min<=v<=max for its stats
        ext = (
            df.withColumn("p", F.spark_partition_id())
            .groupBy("p").agg(F.min(col).alias("lo"), F.max(col).alias("hi"))
            .collect()
        )
        return sum(
            sum(1 for e in ext if e.lo <= v <= e.hi) for v in range(64)
        ) / 64.0

    zl = maintenance.cluster_by_zorder(grid, "x", "y", n_files=16)
    zl.persist().count()
    lin = grid.repartitionByRange(16, "x")
    lin.persist().count()
    z_cost = files_touched(zl, "x") + files_touched(zl, "y")
    lin_cost = files_touched(lin, "x") + files_touched(lin, "y")
    assert z_cost < lin_cost / 1.5, (z_cost, lin_cost)


def test_zorder_rewrite_is_a_range_exchange(spark):
    """Plan shape: ONE range exchange (the global-sort machinery), no
    extra shuffle for the within-file sort."""
    from doc_agent_spark.operators import maintenance

    df = spark.range(1000).selectExpr("id AS x", "id % 37 AS y")
    plan = (
        maintenance.cluster_by_zorder(df, "x", "y", n_files=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1
    assert "rangepartitioning" in plan.lower()


def test_snapshot_expiry_both_conditions_required(spark):
    """Old-but-recent and young-but-deep snapshots both survive; only
    old AND deep expire."""
    import datetime as dt

    rows = [(i, dt.datetime(2024, 1, i + 1)) for i in range(10)]  # ids 0..9, days 1..10
    snaps = spark.createDataFrame(rows, "snapshot_id long, committed_at timestamp")
    out = {
        r.snapshot_id: (r.recency, r.expire)
        for r in maintenance.plan_snapshot_expiry(
            snaps, F.lit("2024-01-06 00:00:00").cast("timestamp"), retain_last=3
        ).collect()
    }
    # newest 3 (ids 9,8,7) keep regardless; ids 5,6 are old?? id i committed day i+1
    # cutoff Jan 6: ids 0..4 (days 1..5) are older than cutoff
    assert all(not out[i][1] for i in (9, 8, 7))          # retain_last
    assert all(not out[i][1] for i in (5, 6))             # young enough
    assert all(out[i][1] for i in (0, 1, 2, 3, 4))        # old AND deep
    assert [out[i][0] for i in (9, 8, 7)] == [1, 2, 3]


def test_snapshot_expiry_retain_last_floor(spark):
    """Even when every snapshot is ancient, retain_last survive."""
    import datetime as dt

    rows = [(i, dt.datetime(2020, 1, i + 1)) for i in range(5)]
    snaps = spark.createDataFrame(rows, "snapshot_id long, committed_at timestamp")
    out = maintenance.plan_snapshot_expiry(
        snaps, F.lit("2024-01-01 00:00:00").cast("timestamp"), retain_last=3
    )
    assert out.filter(~F.col("expire")).count() == 3
    assert out.filter(F.col("expire")).count() == 2


def test_orphan_files_anti_join_broadcasts(spark):
    listing = spark.range(20).select(F.col("id").alias("file_id"))
    refs = spark.range(0, 20, 2).select(F.col("id").alias("file_id"))
    orphans = maintenance.orphan_files(listing, refs)
    assert sorted(r.file_id for r in orphans.collect()) == list(range(1, 20, 2))
    plan = orphans._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_snapshot_diff_classifies(spark):
    from doc_agent_spark.operators.maintenance import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "doc_id long, text string")
    new = spark.createDataFrame(
        [(1, "a"), (2, "B2"), (5, "e")], "doc_id long, text string")
    got = {r.id: r.status for r in snapshot_diff(old, new).collect()}
    # 1 unchanged (dropped), 2 changed, 3+4 removed, 5 added
    assert got == {2: "changed", 3: "removed", 4: "removed", 5: "added"}


def test_snapshot_diff_content_never_shuffles(spark):
    from doc_agent_spark.operators.maintenance import snapshot_diff

    old = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    new = spark.createDataFrame([(1, "b")], "doc_id long, text string")
    plan = snapshot_diff(old, new)._jdf.queryExecution().executedPlan().toString()
    # the projection to (id, md5) happens below the exchange: no raw text col
    import re
    for m in re.finditer(r"Exchange[^\n]*", plan):
        assert "text" not in m.group(0)


def test_heavy_keys_small_sample_does_not_flag_everything(spark):
    """Sub-threshold sample totals must not collapse the cut to 1 (where
    every sampled key is 'hot'): a uniform key distribution yields NO hot
    keys even when total*threshold_share < 1."""
    from doc_agent_spark.plans import skew

    big = spark.createDataFrame(
        [(i % 97, i) for i in range(400)], "key int, row_id int"
    )
    hot = skew.heavy_keys(
        big, "key", row_key="row_id", threshold_share=0.005, sample_fraction=0.3
    )
    # ~120 sampled rows cannot certify a 0.5%-share key (expected rows on a
    # threshold key < 2) — detection abstains rather than flagging flukes
    assert hot == []


def test_split_heavy_preserves_null_spans_rows(spark):
    """size(NULL) is NULL, so null-spans docs must be routed through the
    light branch, not silently dropped by failing both filters."""
    from doc_agent_spark.plans import skew

    df = spark.createDataFrame(
        [(1, [(0, "a")]), (2, None)],
        "doc_id long, spans array<struct<offset:int, text:string>>",
    )
    out = skew.split_heavy(df, max_spans=0)
    assert sorted(r.doc_id for r in out.collect()) == [1, 2]


def test_spread_by_doc_occupies_all_partitions(spark):
    """The spread key is the raw high-cardinality hash: a pre-pmod'd key in
    [0, P) would be re-hashed by repartition and leave ~1/e of partitions
    empty (P groups into P bins). Every target partition must be occupied
    and roughly balanced."""
    from pyspark.sql import functions as F

    from doc_agent_spark.plans import skew

    docs = spark.range(5000).select(F.col("id").alias("doc_id"))
    sizes = (
        skew.spread_by_doc(docs, num_partitions=16)
        .withColumn("p", F.spark_partition_id())
        .groupBy("p").count().collect()
    )
    counts = {r["p"]: r["count"] for r in sizes}
    assert len(counts) == 16                       # zero empty partitions
    assert max(counts.values()) <= 2 * min(counts.values())


# ---------------------------------------------------------------------------
# Zone maps + file skipping
# ---------------------------------------------------------------------------


def _zoned(spark):
    rows = (
        [(0, float(v)) for v in (10, 20, 30)]
        + [(1, float(v)) for v in (35, 60)]
        + [(2, float(v)) for v in (100, 150)]
        + [(3, None), (3, None)]          # all-null file
    )
    return spark.createDataFrame(rows, "file_id long, v double")


def test_zone_map_bounds(spark):
    zm = {r.file_id: r for r in maintenance.zone_map(_zoned(spark), "file_id", ["v"]).collect()}
    assert (zm[0].min_v, zm[0].max_v, zm[0].n_rows, zm[0].n_v) == (10.0, 30.0, 3, 3)
    assert (zm[3].min_v, zm[3].max_v, zm[3].n_rows, zm[3].n_v) == (None, None, 2, 0)


def test_prune_decisions(spark):
    zm = maintenance.zone_map(_zoned(spark), "file_id", ["v"])
    scan = {r.file_id: r.scan for r in
            maintenance.prune_files(zm, "file_id", "v", 25, 50).collect()}
    assert scan == {0: True, 1: True, 2: False, 3: False}  # null bounds skip


def test_prune_is_conservative(spark):
    # never skip a file that holds a matching row, for several predicates
    df = _zoned(spark)
    zm = maintenance.zone_map(df, "file_id", ["v"])
    for lo, hi in [(0, 5), (10, 10), (59, 101), (150, 999)]:
        scanned = {r.file_id for r in
                   maintenance.prune_files(zm, "file_id", "v", lo, hi).collect()
                   if r.scan}
        matching = {r.file_id for r in
                    df.filter((F.col("v") >= lo) & (F.col("v") <= hi)).collect()}
        assert matching <= scanned
