"""BPE tokenizer (operators/tokenizer.py): hand-computed merge goldens,
pretoken-regex parity with textfns, apply-vs-local-reference equality,
and determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from doc_agent_spark.functions import textfns
from doc_agent_spark.operators import tokenizer


def test_hand_computed_merges():
    # the classic toy corpus: pairs counted word-by-word, count-weighted
    counts = [("hug", 10), ("pug", 5), ("pun", 12), ("bun", 4), ("hugs", 5)]
    merges = tokenizer.train_bpe_from_counts(counts, 3)
    # pair freqs round 1: ug=20, un=16, hu=15, pu=17 ... best = ug
    assert merges[0] == ("u", "g")
    # round 2: un=16 vs h+ug=15, p+ug=10... best = un
    assert merges[1] == ("u", "n")
    # round 3: h+ug = 15 wins over p+un (12)
    assert merges[2] == ("h", "ug")


def test_frequency_ties_break_lexicographically():
    merges = tokenizer.train_bpe_from_counts([("ab", 3), ("cd", 3)], 1)
    assert merges == [("a", "b")]


def test_segment_word_applies_lowest_rank_first():
    ranks = {("u", "g"): 0, ("u", "n"): 1, ("h", "ug"): 2}
    assert tokenizer.segment_word("hug", ranks) == ["hug"]
    assert tokenizer.segment_word("pun", ranks) == ["p", "un"]
    assert tokenizer.segment_word("zz", ranks) == ["z", "z"]


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )


def test_pretoken_regex_matches_textfns(spark, corpus):
    """The Python pretokenizer in apply_bpe must produce the identical
    token stream as the column expression (the declared source of truth):
    zero merges -> BPE tokens == per-char split of bpe_ish_tokens."""
    got = (
        tokenizer.apply_bpe(corpus, [])
        .select(
            "doc_id",
            F.col("bpe_tokens"),
            F.flatten(
                F.transform(
                    textfns.bpe_ish_tokens(F.col("text")),
                    lambda w: F.split(w, ""),
                )
            ).alias("expected"),
        )
        .withColumn(
            "expected", F.filter(F.col("expected"), lambda s: s != "")
        )
    )
    assert got.filter(F.col("bpe_tokens") != F.col("expected")).count() == 0


def test_apply_matches_local_reference(spark, corpus):
    merges = tokenizer.train_bpe(corpus.limit(50), n_merges=40)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    sample = corpus.limit(20)
    got = {r["doc_id"]: r["bpe_tokens"]
           for r in tokenizer.apply_bpe(sample, merges).collect()}
    import re

    pre = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
    for r in sample.collect():
        expect = [t for w in pre.findall(r["text"])
                  for t in tokenizer.segment_word(w, ranks)]
        assert got[r["doc_id"]] == expect


def test_tokens_reconstruct_pretokens(spark, corpus):
    """Concatenating each pretoken's BPE pieces reproduces the pretoken:
    merges re-segment, never alter content."""
    merges = tokenizer.train_bpe(corpus.limit(50), n_merges=40)
    joined = tokenizer.apply_bpe(corpus.limit(20), merges).select(
        "doc_id",
        F.concat_ws("", F.col("bpe_tokens")).alias("rebuilt"),
        F.concat_ws("", textfns.bpe_ish_tokens(F.col("text"))).alias("orig"),
    )
    assert joined.filter(F.col("rebuilt") != F.col("orig")).count() == 0


def test_training_deterministic_under_repartitioning(spark, corpus):
    m1 = tokenizer.train_bpe(corpus.repartition(7), n_merges=30)
    m2 = tokenizer.train_bpe(corpus.repartition(2), n_merges=30)
    assert m1 == m2 and len(m1) == 30


def test_max_vocab_cap_is_deterministic_topk(spark, corpus):
    capped = tokenizer.pretoken_counts(corpus, max_vocab=10)
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    full = {(r["word"], r["c"])
            for r in tokenizer.pretoken_counts(corpus).collect()}
    got = [(r["word"], r["c"]) for r in capped.collect()]
    assert len(got) == 10 and set(got) <= full
    assert got == sorted(got, key=lambda wc: (-wc[1], wc[0]))


def test_pretoken_parity_on_unicode_whitespace(spark):
    """Java's \\s is ASCII-only; the Python pretokenizer compiles with
    re.ASCII so NBSP/U+2028 tokenize identically in both engines (they are
    punctuation-class single tokens, not whitespace)."""
    df = spark.createDataFrame(
        [(1, "a b"), (2, "x y")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r["bpe_tokens"]
           for r in tokenizer.apply_bpe(df, []).collect()}
    jvm = {r["doc_id"]: r["t"] for r in df.select(
        "doc_id", textfns.bpe_ish_tokens(F.col("text")).alias("t")).collect()}
    assert got[1] == jvm[1] == ["a", " ", "b"]
    assert got[2] == jvm[2] == ["x", " ", "y"]
