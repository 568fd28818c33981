"""Sequence packing (operators/packing.py) and train/val/test split
assignment (operators/sampling.split_assign): conservation, window
exactness, determinism under physical layout, and edge cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from doc_agent_spark.operators import packing, sampling


@pytest.fixture(scope="module")
def corpus(spark):
    # token counts chosen to exercise: straddling (1500 > budget), exact
    # fit (1024), zero (dropped), tiny (1), and a long doc spanning 3+
    # windows (2600)
    rows = [(i, t) for i, t in enumerate([1500, 1024, 0, 1, 2600, 37, 999, 512, 513, 7])]
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


BUDGET = 1024


def _plan(corpus, n_shards=2):
    return packing.pack_chunks(
        corpus, tokens_col="n_tokens", key_col="doc_id",
        budget=BUDGET, n_shards=n_shards,
    )


def test_token_conservation_per_doc(corpus):
    got = (
        _plan(corpus).groupBy("doc_id").agg(F.sum("slice_len").alias("t"))
        .collect()
    )
    expect = {r.doc_id: r.n_tokens for r in corpus.collect() if r.n_tokens > 0}
    assert {r.doc_id: r.t for r in got} == expect  # zero-token doc absent


def test_windows_fill_exactly_to_budget(corpus):
    # every window except each shard's LAST is exactly `budget` full,
    # with contiguous slices starting at seq_offset 0
    plan = _plan(corpus).collect()
    by_win = {}
    for r in plan:
        by_win.setdefault((r.shard, r.seq_id), []).append(r)
    last_seq = {}
    for (shard, seq), _rows in by_win.items():
        last_seq[shard] = max(last_seq.get(shard, -1), seq)
    for (shard, seq), rows in by_win.items():
        total = sum(r.slice_len for r in rows)
        offsets = sorted((r.seq_offset, r.slice_len) for r in rows)
        # contiguity: each slice starts where the previous ended
        pos = 0
        for off, ln in offsets:
            assert off == pos, (shard, seq, offsets)
            pos += ln
        if seq < last_seq[shard]:
            assert total == BUDGET, (shard, seq, total)
        else:
            assert 0 < total <= BUDGET
    # no gaps in seq_ids per shard
    for shard in last_seq:
        seqs = sorted(s for (sh, s) in by_win if sh == shard)
        assert seqs == list(range(len(seqs)))


def test_slices_stay_inside_documents(corpus):
    joined = _plan(corpus).join(corpus, "doc_id")
    bad = joined.filter(
        (F.col("slice_start") < 0)
        | (F.col("slice_len") <= 0)
        | (F.col("slice_start") + F.col("slice_len") > F.col("n_tokens"))
    )
    assert bad.count() == 0


def test_straddling_doc_slices_are_consecutive(corpus):
    rows = sorted(
        _plan(corpus).filter(F.col("doc_id") == 4).collect(),
        key=lambda r: r.seq_id,
    )
    assert len(rows) >= 3  # 2600 tokens over 1024-token windows
    # within-doc slices advance contiguously from 0
    pos = 0
    for r in rows:
        assert r.slice_start == pos
        pos += r.slice_len
    assert pos == 2600
    # consecutive windows in the same shard
    assert [r.shard for r in rows] == [rows[0].shard] * len(rows)
    assert [r.seq_id for r in rows] == list(
        range(rows[0].seq_id, rows[0].seq_id + len(rows))
    )


def test_layout_invariance(corpus):
    a = sorted(map(tuple, _plan(corpus).collect()))
    b = sorted(map(tuple, _plan(corpus.repartition(7)).collect()))
    c = sorted(map(tuple, _plan(corpus.coalesce(1)).collect()))
    assert a == b == c


def test_invalid_params(corpus):
    with pytest.raises(ValueError):
        packing.pack_chunks(corpus, "n_tokens", "doc_id", budget=0)
    with pytest.raises(ValueError):
        packing.pack_chunks(corpus, "n_tokens", "doc_id", budget=16, n_shards=0)


def test_split_assign_partition_and_determinism(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    splits = {"train": 0.9, "val": 0.05, "test": 0.05}
    out = sampling.split_assign(df, splits, key_col="doc_id")
    rows = out.collect()
    assert len(rows) == 2000  # total function: every row gets one split
    counts = {}
    for r in rows:
        counts[r.split] = counts.get(r.split, 0) + 1
    assert set(counts) <= set(splits)
    # hash-uniform: bands land near their fractions
    assert abs(counts["train"] / 2000 - 0.9) < 0.05
    # stable under repartitioning
    again = sampling.split_assign(df.repartition(13), splits, key_col="doc_id")
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))


def test_split_assign_rejects_bad_fractions(spark):
    df = spark.range(3).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError):
        sampling.split_assign(df, {"train": 0.5, "val": 0.1}, key_col="doc_id")


def test_random_corpus_invariants(spark):
    """Seeded random corpus: conservation + window-exactness must hold for
    arbitrary token-count mixes (many zero-token docs, heavy tails)."""
    import numpy as np

    rng = np.random.default_rng(7)
    toks = np.where(
        rng.random(500) < 0.1, 0, rng.geometric(1 / 300, 500)
    ).astype("int64")
    df = spark.createDataFrame(
        [(int(i), int(t)) for i, t in enumerate(toks)], "doc_id long, n_tokens long"
    )
    plan = packing.pack_chunks(
        df, tokens_col="n_tokens", key_col="doc_id", budget=257, n_shards=5
    ).collect()
    # conservation
    per_doc = {}
    for r in plan:
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + r.slice_len
    assert per_doc == {i: int(t) for i, t in enumerate(toks) if t > 0}
    # every non-final window full, contiguous coverage
    by_win = {}
    for r in plan:
        by_win.setdefault((r.shard, r.seq_id), 0)
        by_win[(r.shard, r.seq_id)] += r.slice_len
    last = {}
    for shard, seq in by_win:
        last[shard] = max(last.get(shard, -1), seq)
    for (shard, seq), total in by_win.items():
        if seq < last[shard]:
            assert total == 257
    # total windows = ceil(shard token mass / budget), per shard
    shard_mass = {}
    for r in plan:
        shard_mass[r.shard] = shard_mass.get(r.shard, 0) + r.slice_len
    for shard, mass in shard_mass.items():
        assert last[shard] + 1 == -(-mass // 257)


def test_shuffle_windows_deterministic_global_order(spark, corpus):
    wins = _plan(corpus, n_shards=4).select("shard", "seq_id").distinct()
    a = packing.shuffle_windows(
        wins.repartition(5), seed="s1", partitions=3, stream_cols=()
    )
    b = packing.shuffle_windows(
        wins.repartition(1), seed="s1", partitions=2, stream_cols=()
    )
    # toLocalIterator yields partitions in index order: range partitioning
    # + within-partition sort must produce one globally sorted sequence,
    # identical regardless of input layout or partition count
    oa = [r["order_key"] for r in a.toLocalIterator()]
    ob = [r["order_key"] for r in b.toLocalIterator()]
    assert oa == sorted(oa) and oa == ob
    assert len(oa) == wins.count()


def test_shuffle_windows_seed_changes_the_permutation(spark, corpus):
    wins = _plan(corpus, n_shards=4).select("shard", "seq_id").distinct()
    one = [(r["shard"], r["seq_id"]) for r in packing.shuffle_windows(
        wins, seed="epoch1", partitions=2, stream_cols=()).toLocalIterator()]
    two = [(r["shard"], r["seq_id"]) for r in packing.shuffle_windows(
        wins, seed="epoch2", partitions=2, stream_cols=()).toLocalIterator()]
    assert sorted(one) == sorted(two)  # same windows
    assert one != two                  # different epoch order


def test_leak_safe_split_keeps_clusters_together(spark):
    ids = spark.range(0, 500).select(F.col("id").cast("long"))
    # clusters: {0..9}->0, {100..104}->100; everything else unclustered
    members = [(i, 0) for i in range(10)] + [(100 + i, 100) for i in range(5)]
    clusters = spark.createDataFrame(members, "id long, cluster_id long")
    out = sampling.leak_safe_split(
        ids, clusters, {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    rows = {r["id"]: (r["group_key"], r["split"]) for r in out.collect()}
    assert len(rows) == 500  # total: every id assigned exactly once
    # leakage invariant: every cluster member shares one split
    assert len({rows[i][1] for i in range(10)}) == 1
    assert len({rows[100 + i][1] for i in range(5)}) == 1
    # unclustered docs hash on their own id — same as a plain split
    plain = sampling.split_assign(
        ids.withColumnRenamed("id", "k"), {"train": 0.8, "val": 0.1, "test": 0.1},
        key_col="k",
    )
    plain_map = {r["k"]: r["split"] for r in plain.collect()}
    clustered = {m[0] for m in members}
    for i in set(rows) - clustered:
        assert rows[i][1] == plain_map[i]
