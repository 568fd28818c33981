"""Gopher rule battery (functions/gopher.py): hand-computed goldens for
every signal, the n=2 equivalence with the pre-existing top-bigram
operator, the dup-fraction cap, and engine parity via the tiny-corpus
DuckDB mirror (the gate runs the full mirror at sf0.01)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from doc_agent_spark.functions import gopher, textfns

TEXT_REP = "the cat sat on the mat and the cat sat on the mat"  # 49 chars
PAGE = "line one\n• bullet\n- dash\nend..."


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        (1, TEXT_REP, PAGE),
        (2, "alpha beta gamma", "x\ny…\nz"),
        (3, "", ""),
        (4, "### ... hmm # 1 2 3", "only"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, page string")


def _one(df, col, doc_id=1):
    return {r["doc_id"]: r["v"] for r in df.select("doc_id", col.alias("v")).collect()}[doc_id]


def test_outlier_signals_goldens(tiny):
    t, p = F.col("text"), F.col("page")
    # 13 words, 37 letters -> 37/13 = 2.8462
    assert _one(tiny, gopher.mean_word_length(t)) == pytest.approx(2.8462)
    # doc 4: '###' counts 3 hashes + one '...' + one standalone '#': 5 syms / 4 words
    assert _one(tiny, gopher.symbol_word_ratio(t), 4) == pytest.approx(1.25)
    # page: 4 lines, 2 bullet-start, 1 ellipsis-end
    assert _one(tiny, gopher.bullet_line_fraction(p)) == pytest.approx(0.5)
    assert _one(tiny, gopher.ellipsis_line_fraction(p)) == pytest.approx(0.25)
    # doc 4 words: ['hmm','1','2','3'] -> 1/4 alphabetic
    assert _one(tiny, gopher.alpha_word_fraction(t), 4) == pytest.approx(0.25)
    # doc 1 has 'the' and 'and' from the required list, distinct hits = 2
    assert _one(tiny, gopher.required_stopword_hits(t)) == 2
    # empty text/page: all signals 0, no division error
    assert _one(tiny, gopher.mean_word_length(t), 3) == 0.0
    assert _one(tiny, gopher.bullet_line_fraction(p), 3) == 0.0


def test_repetition_profile_goldens(tiny):
    prof = {r["doc_id"]: r.asDict() for r in gopher.ngram_repetition_profile(tiny).collect()}
    # doc1: top bigram 'the cat' (x2, 7 chars) -> 14/49
    assert prof[1]["top2gram_char_frac"] == pytest.approx(round(14 / 49, 4))
    # top trigram 'the cat sat' (x2, 11 chars) -> 22/49
    assert prof[1]["top3gram_char_frac"] == pytest.approx(round(22 / 49, 4))
    # dup 5-grams: 2 grams x2 occurrences x 18 chars = 72 > 49 -> capped at 1.0
    assert prof[1]["dup5gram_char_frac"] == 1.0
    # one repeated 6-gram: 'the cat sat on the mat' x2, 22 chars -> 44/49
    assert prof[1]["dup6gram_char_frac"] == pytest.approx(round(44 / 49, 4))
    # no 7-gram repeats in doc1
    assert prof[1]["dup7gram_char_frac"] == 0.0
    # doc2 (3 words): top-n counts singletons too (existing top2 semantics):
    # 'alpha beta' x1, 10 chars / 16 chars. No 5-grams at all.
    assert prof[2]["top2gram_char_frac"] == pytest.approx(0.625)
    assert prof[2]["dup5gram_char_frac"] == 0.0
    # doc3 (empty) survives with all-zero row
    assert prof[3]["top4gram_char_frac"] == 0.0


def test_top2_matches_existing_operator(spark, sf_dir):
    """The generalized profile's n=2 column must be bit-identical to
    textfns.top_bigram_char_fraction (quality_tokens swapped to the former)."""
    from doc_agent_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents").limit(200)
    a = {
        r["doc_id"]: r["top2gram_char_frac"]
        for r in gopher.ngram_repetition_profile(docs).collect()
    }
    b = {
        r["doc_id"]: r["top2gram_char_frac"]
        for r in textfns.top_bigram_char_fraction(docs).collect()
    }
    assert a == b


def test_pass_flags(tiny):
    flags = {
        r["doc_id"]: r["p"]
        for r in tiny.select(
            "doc_id",
            gopher.gopher_outlier_pass(F.col("text"), F.col("page")).alias("p"),
        ).collect()
    }
    # every tiny doc fails at least the 50-word floor
    assert flags == {1: False, 2: False, 3: False, 4: False}
    rep = gopher.repetition_pass(
        F.lit(0.0), F.lit(0.0), {2: F.lit(0.21)}, {5: F.lit(0.0)}
    )
    df = tiny.limit(1).select(rep.alias("p"))
    assert df.collect()[0]["p"] is False  # top2 cap 0.20 enforced


def test_duckdb_parity_tiny(spark, tiny):
    rows = [(r["doc_id"], r["text"], r["page"]) for r in tiny.collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR, page VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?,?,?)", rows)
    words = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), w -> w <> '')"
    duck = {
        r[0]: r[1:]
        for r in con.execute(
            f"""SELECT doc_id, {gopher.mean_word_length_sql(words)},
            {gopher.symbol_word_ratio_sql('text', words)},
            {gopher.bullet_line_fraction_sql('page')},
            {gopher.ellipsis_line_fraction_sql('page')},
            {gopher.alpha_word_fraction_sql(words)},
            {gopher.required_stopword_hits_sql(words)} FROM documents"""
        ).fetchall()
    }
    got = {
        r["doc_id"]: (r["mwl"], r["swr"], r["bf"], r["ef"], r["awf"], r["sh"])
        for r in tiny.select(
            "doc_id",
            gopher.mean_word_length(F.col("text")).alias("mwl"),
            gopher.symbol_word_ratio(F.col("text")).alias("swr"),
            gopher.bullet_line_fraction(F.col("page")).alias("bf"),
            gopher.ellipsis_line_fraction(F.col("page")).alias("ef"),
            gopher.alpha_word_fraction(F.col("text")).alias("awf"),
            gopher.required_stopword_hits(F.col("text")).alias("sh"),
        ).collect()
    }
    for k in duck:
        assert tuple(float(x) for x in got[k]) == pytest.approx(
            tuple(float(x) for x in duck[k])
        ), k
    prof_sql = "WITH " + gopher.ngram_repetition_sql(words) + " SELECT * FROM gop_prof"
    duck_prof = {r[0]: r[1:] for r in con.execute(prof_sql).fetchall()}
    spark_prof = gopher.ngram_repetition_profile(
        spark.createDataFrame(rows, "doc_id long, text string, page string")
    )
    cols = [c for c in spark_prof.columns if c != "doc_id"]
    got_prof = {r["doc_id"]: tuple(r[c] for c in cols) for r in spark_prof.collect()}
    for k in duck_prof:
        assert got_prof[k] == pytest.approx(tuple(float(x) for x in duck_prof[k])), k
