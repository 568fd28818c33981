"""Benchmark decontamination (dedup.contamination_pairs / decontaminate).

The op the reference lacks but every training-data pipeline needs: flag
corpus documents whose n-gram shingles contain ≥ threshold of an eval
benchmark document's shingles, then drop them. Containment is BENCH-side
(|doc ∩ bench| / |bench|) so a long doc quoting a whole benchmark item
scores 1.0 regardless of its own size.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from doc_agent_spark.operators import dedup


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # 10: verbatim copy of bench 100 embedded in extra prose
        (10, "intro words here the quick brown fox jumps over the lazy dog trailing words after"),
        # 11: half of bench 100's shingles only
        (11, "the quick brown fox jumps elsewhere entirely now"),
        # 12: unrelated
        (12, "completely different content about spark shuffles and partitions"),
        # 13: verbatim copy of bench 101, nothing else
        (13, "alpha beta gamma delta epsilon zeta"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def bench(spark):
    rows = [
        (100, "the quick brown fox jumps over the lazy dog"),
        (101, "alpha beta gamma delta epsilon zeta"),
        (102, "xx"),  # < 3 words: no shingles, must emit nothing
    ]
    return spark.createDataFrame(rows, "bench_id long, text string")


def test_containment_direction_and_threshold(corpus, bench):
    got = {
        (r.doc_id, r.bench_id): r.containment
        for r in dedup.contamination_pairs(corpus, bench, threshold=0.5).collect()
    }
    # full quotes hit 1.0 regardless of the doc's own extra shingles
    assert got[(10, 100)] == 1.0
    assert got[(13, 101)] == 1.0
    # partial overlap (3 of 7 bench shingles ≈ 0.43) stays below 0.5
    assert (11, 100) not in got
    assert (12, 100) not in got and (12, 101) not in got
    # shingleless bench doc can never contaminate
    assert not any(b == 102 for _, b in got)
    # lowering the threshold admits the partial overlap
    low = {
        (r.doc_id, r.bench_id): r.containment
        for r in dedup.contamination_pairs(corpus, bench, threshold=0.3).collect()
    }
    assert (11, 100) in low and 0 < low[(11, 100)] < 0.5


def test_decontaminate_drops_only_contaminated(corpus, bench):
    kept = sorted(
        r.doc_id for r in dedup.decontaminate(corpus, bench, threshold=0.5).collect()
    )
    assert kept == [11, 12]
    # schema is passed through untouched
    assert dedup.decontaminate(corpus, bench).columns == corpus.columns


def test_bench_side_is_broadcast(corpus, bench):
    """The corpus shingle mass must never shuffle to meet the benchmark:
    the bench shingle index joins via BroadcastHashJoin and the corpus
    side of that join has no Exchange."""
    plan = (
        dedup.contamination_pairs(corpus, bench)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the ONLY shuffle is the partial-aggregated (doc, bench) count — one
    # hashpartitioning exchange; the shingle join itself is exchange-free
    assert plan.count("Exchange hashpartitioning") == 1


def test_matches_gate_arm_on_testdata(spark, sf_dir):
    """The gate entry's contamination arm is non-empty on the real corpus:
    every %10-rekeyed copy of a %70 doc is an exact bench quote (1.0)."""
    import __spark_entry__ as entry

    rows = entry.queries()["ngram_overlap"](spark, sf_dir).filter(
        F.col("variant") == "contamination"
    ).collect()
    assert rows
    exact = {r.id_a for r in rows if r.score == 1.0}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    expect = {
        int(r.doc_id) + 1000000
        for r in docs.filter(F.col("doc_id") % 70 == 0).collect()
        # rekeys only exist for %10 docs; %70 ⊂ %10, and 3+ words needed
        if len([w for w in r.text.lower().split() if w]) >= 3
    }
    assert expect <= exact

# --- winnowing fingerprints (Schleimer et al. 2003) ----------------------

def test_winnow_guarantee_and_density(spark):
    from doc_agent_spark.operators import dedup

    shared = "p q r s t u v w x"          # 9 tokens >= w+k-1 = 8
    docs = spark.createDataFrame(
        [
            (1, shared + " alpha beta gamma"),
            (2, "mm nn oo " + shared),
            (3, "cc dd ee ff gg hh ii jj kk ll"),   # disjoint vocab
        ],
        "doc_id long, text string",
    )
    rows = dedup.winnow_fingerprints(docs).collect()
    fps = {}
    for r in rows:
        assert r.pos >= 1
        fps.setdefault(r.id, set()).add(r.h)
    # every doc selects at least one fingerprint
    assert set(fps) == {1, 2, 3}
    # guarantee: docs 1 and 2 share the 9-token passage -> a common hash
    assert fps[1] & fps[2]
    # disjoint vocab -> disjoint shingles -> no shared fingerprint
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])

    groups = dedup.winnow_groups(docs).collect()
    assert all(g.dup_count == 2 and g.keep_id == 1 for g in groups)
    assert len(groups) >= 1


def test_winnow_short_doc_selects_nothing(spark):
    from doc_agent_spark.operators import dedup

    # 3 tokens < k=4 -> no shingles; 6 tokens -> 3 shingles < w=5 windows
    docs = spark.createDataFrame(
        [(1, "just three words"), (2, "only six words live right here")],
        "doc_id long, text string",
    )
    assert dedup.winnow_fingerprints(docs).count() == 0


def test_winnow_rightmost_tie_and_window_count(spark):
    from doc_agent_spark.operators import dedup

    # identical repeated token stream: every shingle hash is identical, so
    # each window's rightmost-min is its last member -> positions w..n
    docs = spark.createDataFrame([(1, " ".join(["t"] * 12))], "doc_id long, text string")
    rows = dedup.winnow_fingerprints(docs, w=5).collect()
    # 9 shingles, 5 full windows (j=1..5), rightmost of window j = j+4
    assert sorted(r.pos for r in rows) == [5, 6, 7, 8, 9]
    assert len({r.h for r in rows}) == 1


def test_winnow_deterministic_across_parallelism(spark):
    from doc_agent_spark.operators import dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(
        (r.key, r.keep_id, r.dup_count)
        for r in dedup.winnow_groups(docs.repartition(1)).collect()
    )
    b = sorted(
        (r.key, r.keep_id, r.dup_count)
        for r in dedup.winnow_groups(docs.repartition(13)).collect()
    )
    assert a == b and len(a) > 0
