"""CCNet-style bigram-LM quality scoring (operators/lm_quality.py).

Hand-computed stupid-backoff goldens pin all three scoring arms (seen
bigram / unigram backoff / unk), plus determinism under re-partitioning
and the broadcast-join / no-Python plan shape.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from doc_agent_spark.operators import lm_quality


@pytest.fixture(scope="module")
def tiny(spark):
    # unigrams: a:3 b:3 c:1 z:1 (T=8); bigrams: (a,b):3 (b,a):1 (b,c):1
    # min_count=2 model: mu={a,b}, mb={(a,b):3}
    return spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "z")], ["doc_id", "text"]
    )


def test_hand_computed_backoff_arms(spark, tiny):
    prof = lm_quality.lm_quality_profile(tiny, min_count=2)
    rows = {r["doc_id"]: r for r in prof.collect()}
    # doc 3 has < 2 tokens -> no bigrams -> absent
    assert set(rows) == {1, 2}
    # doc 1: (a,b)=ln(3/3)=0, (b,a)=backoff ln(0.4*3/8), (a,b)=0
    ce1 = -(0.0 + math.log(0.4 * 3 / 8) + 0.0) / 3
    assert rows[1]["n_bigrams"] == 3
    assert rows[1]["lm_ce"] == pytest.approx(round(ce1, 6), abs=1e-9)
    # doc 2: (a,b)=0, (b,c)=unk ln(0.4/8)
    ce2 = -(0.0 + math.log(0.4 / 8)) / 2
    assert rows[2]["n_bigrams"] == 2
    assert rows[2]["lm_ce"] == pytest.approx(round(ce2, 6), abs=1e-9)


def test_seen_bigram_conditions_on_full_unigram_count(spark):
    # 'b b' seen twice but c(b)=4: p(b|b) = 2/4, NOT 2/2 — the conditioning
    # count is the unigram count, never the bigram-row mass.
    df = spark.createDataFrame([(1, "b b b b")], ["doc_id", "text"])
    prof = lm_quality.lm_quality_profile(df, min_count=2)
    r = prof.collect()[0]
    assert r["lm_ce"] == pytest.approx(round(-math.log(3 / 4), 6), abs=1e-9)


def test_tier_cutoffs_apply_to_rounded_ce(spark, tiny):
    ce1 = round(-(math.log(0.4 * 3 / 8)) / 3, 6)
    prof = lm_quality.lm_quality_profile(
        tiny, min_count=2, head_ce=ce1 + 1e-6, middle_ce=1.0
    )
    tiers = {r["doc_id"]: r["lm_tier"] for r in prof.collect()}
    assert tiers[1] == "head"      # strictly below head cutoff
    assert tiers[2] == "tail"      # above middle cutoff


def test_deterministic_under_repartitioning(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    a = lm_quality.lm_quality_profile(docs.repartition(7), min_count=2)
    b = lm_quality.lm_quality_profile(docs.repartition(2), min_count=2)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_top_v_unigrams_deterministic_ties(spark, tiny):
    uni, _, _ = lm_quality.corpus_bigram_lm(tiny, min_count=1)
    top2 = lm_quality.top_v_unigrams(uni, 3).collect()
    # a:3 b:3 tie broken by word asc, then the c/z tie picks 'c'
    assert [(r["w"], r["c"]) for r in top2] == [("a", 3), ("b", 3), ("c", 1)]


def test_plan_broadcast_joins_no_python(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    prof = lm_quality.lm_quality_profile(docs, min_count=2)
    plan = prof._jdf.queryExecution().executedPlan().toString()
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                "CartesianProduct", "SortMergeJoin"):
        assert bad not in plan, f"lm scoring path contains {bad}"
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_top_v_cap_falls_back_instead_of_nulling(spark):
    # 'q r' is a frequent bigram but both words rank below the v=2 cap
    # (a:6, b:6 dominate); the seen arm must NOT fire with a NULL c1 —
    # the bigram falls through to the unk arm and lm_ce stays non-null.
    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "a b a b a b"), (3, "q r q r")],
        ["doc_id", "text"],
    )
    uni, big, tot = lm_quality.corpus_bigram_lm(df, min_count=2)
    capped = lm_quality.top_v_unigrams(uni, 2)
    rows = {r["doc_id"]: r for r in
            lm_quality.doc_cross_entropy(df, capped, big, tot).collect()}
    assert rows[3]["lm_ce"] is not None
    # every doc-3 bigram resolves via the unk arm: ln(0.4 / T), T=16
    import math
    assert rows[3]["lm_ce"] == pytest.approx(
        round(-math.log(0.4 / 16), 6), abs=1e-9)


def test_factored_builders_match_combined(spark, tiny):
    uni, big, tot = lm_quality.corpus_bigram_lm(tiny, min_count=2)
    uni2 = lm_quality.corpus_unigrams(tiny).filter("c >= 2")
    big2 = lm_quality.corpus_bigrams(tiny, 2)
    assert sorted(map(tuple, uni.collect())) == sorted(map(tuple, uni2.collect()))
    assert sorted(map(tuple, big.collect())) == sorted(map(tuple, big2.collect()))
