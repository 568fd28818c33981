"""Unit tests for the training-data operator families (dedup, similarity,
search, text analytics) on small hand-built frames with known answers."""

import math

import pytest

from pyspark.sql import functions as F

from doc_agent_spark.functions import textfns, vectors
from doc_agent_spark.operators import dedup, search, similarity


@pytest.fixture(scope="module")
def texts(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),     # exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat"),     # near dup
        (4, "completely different content about spark joins"),
        (5, "THE  Quick   Brown Fox jumps over the lazy dog"),  # ws/case variant
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dups(spark, texts):
    out = dedup.exact_dups(texts).collect()
    assert len(out) == 1
    assert out[0].keep_id == 1 and out[0].dup_count == 2


def test_fingerprint_normalizes_ws_and_case(spark, texts):
    fp = texts.select("doc_id", textfns.fingerprint(F.col("text")).alias("fp"))
    vals = {r.doc_id: r.fp for r in fp.collect()}
    assert vals[1] == vals[2] == vals[5]  # collapse whitespace + lowercase
    assert vals[1] != vals[3]


def test_ngram_jaccard(spark, texts):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(texts, threshold=0.5).collect()
    }
    assert pairs[(1, 2)] == 1.0
    # doc3 differs in last word: 7 shingles each, 6 shared → 6/8 = 0.75
    assert math.isclose(pairs[(1, 3)], 0.75)
    assert (1, 4) not in pairs


def test_minhash_exact_dups_share_all_bands(spark, texts):
    pairs = {
        (r.id_a, r.id_b): r.n_bands
        for r in dedup.minhash_lsh_pairs(texts, k=8, bands=4).collect()
    }
    assert pairs[(1, 2)] == 4
    assert pairs[(2, 5)] == 4  # identical token streams after tokenization
    assert pairs.get((1, 3), 0) >= 0  # near-dup may or may not band-collide


def test_minhash_shingleless_docs_emit_no_candidates(spark):
    """Docs with fewer than 3 words have no 3-gram shingles and must NOT
    pair — the old constant-signature fallback made every empty doc a
    mutual candidate (a quadratic clique at corpus scale); empty/near-empty
    text belongs to exact dedup."""
    rows = [
        (1, ""), (2, ""), (3, "   "), (4, "one two"),
        (5, "the quick brown fox jumps"), (6, "the quick brown fox jumps"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r.id_a, r.id_b) for r in dedup.minhash_lsh_pairs(df, k=8, bands=4).collect()}
    assert pairs == {(5, 6)}


def test_simhash_identical_for_same_tokens(spark, texts):
    sig = texts.select("doc_id", dedup.simhash16(F.col("text")).alias("s"))
    vals = {r.doc_id: r.s for r in sig.collect()}
    assert vals[1] == vals[2] == vals[5]
    assert 0 <= vals[1] < 65536


def test_cosine_topk_identity(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.cosine_topk(emb, [1.0, 0.0, 0.0], k=3).collect()
    assert [r.id for r in out] == [0, 1, 2]
    assert out[0].score == 1.0
    assert out[2].score == 0.0


def test_knn_join(spark):
    rows = [(i, [float(i), 1.0]) for i in range(5)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.knn_join_brute(emb, emb, k=1)
    top = {r.lid: r.rid for r in out.collect()}
    assert all(top[i] == i for i in range(5))  # self is nearest


def test_bm25_ranks_matching_docs(spark, texts):
    scores = {r.id: r.score for r in search.bm25_scores(texts, ["spark", "fox"]).collect()}
    assert 4 in scores              # only doc with 'spark'
    assert scores[4] > scores[1]    # rare term beats common term
    assert set(scores) == {1, 2, 3, 4, 5}


def test_rrf_fusion_prefers_doubly_ranked(spark):
    a = spark.createDataFrame([(1, 0.9), (2, 0.8)], "id long, score double")
    b = spark.createDataFrame([(2, 0.95), (3, 0.7)], "id long, score double")
    out = {r.id: r.rrf_score for r in search.rrf_fuse(a, b, k=60).collect()}
    assert out[2] > out[1] and out[2] > out[3]
    assert math.isclose(out[2], round(1 / 62 + 1 / 61, 6))


def test_lang_id(spark):
    rows = [
        (1, "the cat and the dog in the house"),
        (2, "der hund und die katze ist klein"),
        (3, "le chat et le chien est petit"),
        (4, "xyzzy qwerty asdf"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.lang for r in df.select("doc_id", textfns.lang_id(F.col("text")).alias("lang")).collect()}
    assert out[1] == "en" and out[2] == "de" and out[3] == "fr" and out[4] == "und"


def test_token_counts(spark):
    df = spark.createDataFrame([(1, "Hello, world! 42 times.")], "id long, text string")
    r = df.select(
        textfns.token_count(F.col("text")).alias("ws"),
        textfns.bpe_ish_token_count(F.col("text")).alias("bpe"),
    ).collect()[0]
    assert r.ws == 4
    # Hello , world ! 42 times . → 7
    assert r.bpe == 7


def test_dup_line_fractions(spark):
    rows = [
        # 5 non-empty trimmed lines, 3 distinct → 1 - 3/5; chars 23 total,
        # 14 distinct → 9/23 (the blank and padded lines normalize away)
        (1, "alpha\nbeta\nalpha\n\n  beta  \ngamma"),
        (2, "single line only"),
        (3, ""),
        (4, "  \n  "),
        # one long duplicated line dominates by chars, not by line count
        (5, "aaaaaaaaaa\naaaaaaaaaa\nb"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: (r.lf, r.cf)
        for r in df.select(
            "doc_id",
            textfns.dup_line_fraction(F.col("text")).alias("lf"),
            textfns.dup_line_char_fraction(F.col("text")).alias("cf"),
        ).collect()
    }
    assert out[1] == (round(1 - 3 / 5, 4), round(9 / 23, 4))
    assert out[2] == (0.0, 0.0)
    assert out[3] == (0.0, 0.0)
    assert out[4] == (0.0, 0.0)
    lf5, cf5 = out[5]
    assert lf5 == round(1 - 2 / 3, 4)
    assert cf5 == round(10 / 21, 4)
    assert cf5 > lf5  # char weighting catches the big duplicated block


def test_word_bigrams_keep_multiplicity(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a"), (2, "solo"), (3, "")], "doc_id long, text string"
    )
    out = {
        r.doc_id: r.g
        for r in df.select(
            "doc_id", textfns.word_bigrams_all(F.col("text")).alias("g")
        ).collect()
    }
    assert out[1] == ["a b", "b a", "a b", "b a"]  # unlike word_ngrams: not distinct
    assert out[2] == [] and out[3] == []


def test_top_bigram_char_fraction(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "hello"), (3, "")], "doc_id long, text string"
    )
    out = {
        r.doc_id: r.top2gram_char_frac
        for r in textfns.top_bigram_char_fraction(df).collect()
    }
    # "a b" occurs 3× (len 3) over 11 chars; "b a" only 2×
    assert out[1] == round(9 / 11, 4)
    assert out[2] == 0.0 and out[3] == 0.0  # <2 words → left-join null → 0.0


@pytest.fixture(scope="module")
def paged(spark):
    rows = [
        (1, "HEADER\nunique one\nFOOTER"),
        (2, "HEADER\nunique two\nFOOTER"),
        (3, "HEADER\nunique three"),
        (4, "standalone"),
        (5, "HEADER\nFOOTER"),          # all boilerplate
        (6, "z last\nHEADER\na first"),  # order must survive reassembly
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_line_dups_document_frequency(spark, paged):
    out = {r.line_md5: r for r in dedup.line_dups(paged).collect()}
    by_count = sorted((r.dup_count, r.keep_id) for r in out.values())
    # FOOTER in docs {1,2,5}; HEADER in docs {1,2,3,5,6}
    assert by_count == [(3, 1), (5, 1)]


def test_strip_duplicated_lines(spark, paged):
    out = {
        r.doc_id: r for r in dedup.strip_duplicated_lines(paged, min_docs=2).collect()
    }
    assert len(out) == 6  # line-less/emptied docs are kept with empty text
    assert (out[1].text_clean, out[1].n_lines_kept, out[1].n_lines_removed) == (
        "unique one", 1, 2,
    )
    assert out[3].text_clean == "unique three"
    assert (out[4].text_clean, out[4].n_lines_removed) == ("standalone", 0)
    assert (out[5].text_clean, out[5].n_lines_kept, out[5].n_lines_removed) == ("", 0, 2)
    assert out[6].text_clean == "z last\na first"  # original order, not sorted


def test_lsh_bucket_deterministic(spark):
    rows = [(0, [1.0, 2.0, 3.0]), (1, [1.0, 2.0, 3.0]), (2, [-1.0, -2.0, -3.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = emb.select("vec_id", vectors.lsh_bucket(F.col("embedding"), 4).alias("b")).collect()
    vals = {r.vec_id: r.b for r in out}
    assert vals[0] == vals[1]
    assert vals[0] + vals[2] == 15  # opposite vector flips every plane bit


def test_ngram_df_cap_bounds_stop_shingle_candidates(spark):
    """Skew hardening: one ubiquitous 3-gram must not produce a quadratic
    candidate set. 40 docs all share a boilerplate prefix; only one true
    near-dup pair shares rare content."""
    boiler = "all rights reserved by the example corporation"
    rows = [(i, f"{boiler} unique{i} filler{i} content{i} item{i}") for i in range(40)]
    rows += [
        (100, f"{boiler} rare shared phrase appears here alpha"),
        (101, f"{boiler} rare shared phrase appears here beta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    # threshold 0 surfaces the raw candidate pair set
    uncapped = dedup.ngram_jaccard_pairs(df, threshold=0.0).count()
    capped_pairs = dedup.ngram_jaccard_pairs(
        df, threshold=0.0, max_shingle_df=5
    ).collect()
    assert uncapped == 42 * 41 // 2  # boilerplate joins every doc to every doc
    # cap drops the df=42 boilerplate shingles; only the rare-phrase pair stays
    assert [(r.id_a, r.id_b) for r in capped_pairs] == [(100, 101)]
    # jaccard is over KEPT shingles: 6 kept each (5 boilerplate-internal
    # dropped), 5 shared → 5 / (6 + 6 - 5)
    assert abs(capped_pairs[0].jaccard - round(5 / 7, 6)) < 1e-9


def test_banded_lsh_recalls_dups_with_bounded_buckets(spark):
    """Multi-table SRP-LSH: 12 planes keep buckets tiny on near-orthogonal
    noise, and identical vectors are still recalled (they share every
    bucket in every table)."""
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = [(i, [float(x) for x in rng.randn(16)]) for i in range(60)]
    vecs.append((100, vecs[0][1]))   # exact dup of 0
    vecs.append((101, vecs[1][1]))   # exact dup of 1
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")

    out = dedup.embedding_near_dups(emb, threshold=0.99, n_planes=12, n_tables=8)
    assert sorted((r.id_a, r.id_b) for r in out.collect()) == [(0, 100), (1, 101)]

    # bucket-size boundedness: no table's bucket holds a task-breaking share
    from doc_agent_spark.functions.vectors import lsh_bucket
    sizes = (
        emb.select(lsh_bucket(F.col("embedding"), n_planes=12, seed=42).alias("b"))
        .groupBy("b").count().agg(F.max("count")).collect()[0][0]
    )
    assert sizes <= 8  # 62 vectors over 4096 buckets: every bucket task-sized


def test_simhash_near_pairs_matches_bruteforce(spark, texts):
    sigs = {
        r.doc_id: r.sig
        for r in texts.select(
            "doc_id", dedup.simhash16(F.col("text")).alias("sig")
        ).collect()
    }
    expected = {
        (a, b, bin(sigs[a] ^ sigs[b]).count("1"))
        for a in sigs for b in sigs
        if a < b and bin(sigs[a] ^ sigs[b]).count("1") <= 1
    }
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in dedup.simhash_near_pairs(texts).collect()
    }
    assert got == expected
    assert expected  # fixture contains exact dups → at least one 0-distance pair


def test_fake_embedder_deterministic_and_bounded(spark):
    from doc_agent_spark.functions import embedder

    df = spark.createDataFrame(
        [(1, "alpha"), (2, "alpha"), (3, "beta")], "id long, text string"
    )
    out = {r.id: r.embedding for r in embedder.embed(df, "id", "text", dim=8).collect()}
    assert out[1] == out[2] != out[3]
    assert len(out[1]) == 8
    assert all(-0.5 <= x < 0.5 for x in out[1])


def test_verify_pairs_jaccard_on_candidates_only(spark, texts):
    pairs = spark.createDataFrame(
        [(1, 2), (1, 4)], "id_a long, id_b long"   # one dup pair, one unrelated
    )
    out = {(r.id_a, r.id_b): r.jaccard
           for r in dedup.verify_pairs_jaccard(pairs, texts, threshold=0.0).collect()}
    assert out[(1, 2)] == 1.0
    assert out[(1, 4)] == 0.0
    assert (2, 5) not in out  # non-candidates are never scored


def test_simhash_width_stable_low_bits(spark, texts):
    out = texts.select(
        dedup.simhash_bits(F.col("text"), 16).alias("s16"),
        dedup.simhash_bits(F.col("text"), 32).alias("s32"),
    ).collect()
    for r in out:
        assert r.s32 & 0xFFFF == r.s16   # low bits are width-stable
        assert 0 <= r.s32 < 1 << 32


def test_ngram_jaccard_block_col_restricts_pairs(spark, texts):
    blocked = texts.withColumn("blk", (F.col("doc_id") <= 2).cast("int"))
    got = {
        (r.id_a, r.id_b)
        for r in dedup.ngram_jaccard_pairs(
            blocked, threshold=0.5, block_col="blk"
        ).collect()
    }
    assert (1, 2) in got      # same block, jaccard 1.0
    # docs 1 and 5 tokenize identically but live in different blocks
    assert (1, 5) not in got and (2, 5) not in got


def test_rm3_expansion_pulls_cooccurring_terms(spark):
    """RM3: terms co-occurring with the query in top-ranked docs become
    expansion terms; docs matching only the expansions get promoted."""
    rows = (
        # 'spark' docs mention 'tungsten' TWICE (tf=2 beats the tf=1
        # co-terms, so the selection tests weighting, not the tiebreak)
        [(i, "spark engine tungsten codegen tungsten pipeline") for i in range(4)]
        # tungsten-only docs: invisible to the raw query, found via RM3
        + [(10 + i, "tungsten memory format columnar layout") for i in range(3)]
        # background noise
        + [(20 + i, "the quick brown fox jumps over dogs") for i in range(6)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    exp = search.rm3_expansion_terms(docs, ["spark"], k_fb=4, m=3)
    terms = [r.term for r in exp.collect()]
    assert "tungsten" in terms and "spark" not in terms
    final = {r.id: r.score for r in search.rm3_scores(
        docs, ["spark"], k_fb=4, m=3).collect()}
    assert set(range(4)) <= set(final)          # original hits kept
    assert {10, 11, 12} <= set(final)           # expansion-only docs surfaced
    assert all(final[i] > final[10] for i in range(4))  # originals still rank higher


def test_rm3_matches_sql_mirror(spark):
    import duckdb

    rows = [
        (i, "spark engine tungsten codegen pipeline" if i % 3 == 0 else
            ("tungsten memory format columnar" if i % 3 == 1 else
             "the quick brown fox jumps over dogs"))
        for i in range(30)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    spark_rows = sorted(
        (r.id, r.score) for r in search.rm3_scores(docs, ["spark"], k_fb=5, m=2).collect()
    )
    con = duckdb.connect()
    con.execute("SET threads=2")
    con.register("t", docs.toPandas())
    sql = search.rm3_sql(
        "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), w -> w <> '')",
        "t", "doc_id", ["spark"], k_fb=5, m=2,
    )
    duck_rows = sorted(map(tuple, con.execute(sql).fetchall()))
    assert duck_rows == spark_rows


def test_ql_dirichlet_scores_every_doc(spark, texts):
    out = {r.id: r.score for r in search.ql_scores(
        texts, ["spark", "fox"], mu=100.0).collect()}
    assert set(out) == {1, 2, 3, 4, 5}          # smoothing: every doc scores
    assert out[4] == max(out.values())          # the only 'spark' doc wins
    # all scores are negative log-likelihood sums
    assert all(v < 0 for v in out.values())


def test_best_window_snippet_picks_densest_span(spark):
    """The span with the most DISTINCT query terms wins; multiplicity of
    one term doesn't beat coverage of two."""
    docs = spark.createDataFrame(
        [(1, "filler " * 20 + "spark spark spark alone here "
             + "filler " * 20 + "spark join together now end")],
        "doc_id long, text string",
    )
    res = spark.createDataFrame([(1, 1.0)], "id long, score double")
    out = search.best_window_snippet(res, docs, ["spark", "join"], window=5).collect()[0]
    assert out.n_hits == 2
    assert "spark join" in out.snippet


def test_best_window_snippet_earliest_tie_and_short_doc(spark):
    docs = spark.createDataFrame(
        [(1, "a spark b c d e f g spark h"), (2, "tiny doc")],
        "doc_id long, text string",
    )
    res = spark.createDataFrame([(1, 1.0), (2, 0.5)], "id long, score double")
    rows = {r.id: r for r in
            search.best_window_snippet(res, docs, ["spark"], window=3).collect()}
    # both spark spans score 1; earliest window wins
    assert rows[1].snippet.startswith("a spark") or rows[1].snippet.startswith("spark")
    assert rows[1].snippet == "a spark b"
    # doc shorter than the window: whole doc is the snippet, zero hits
    assert rows[2].snippet == "tiny doc" and rows[2].n_hits == 0


def test_best_window_snippet_broadcasts_results(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    res = spark.createDataFrame([(1, 1.0)], "id long, score double")
    plan = (
        search.best_window_snippet(res, docs, ["x"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_tfidf_keywords_scores_and_tie_order(spark):
    from doc_agent_spark.operators import search

    docs = spark.createDataFrame(
        [(1, "apple apple banana"), (2, "banana cherry"),
         (3, "cherry cherry cherry durian")],
        "doc_id long, text string",
    )
    got = {
        (r.id, r.rank): (r.term, r.score)
        for r in search.tfidf_keywords(docs, k=3).collect()
    }
    import math
    idf1 = round(2 * (math.log(4 / 2) + 1), 6)
    assert got[(1, 1)] == ("apple", idf1)
    assert got[(1, 2)][0] == "banana"
    # doc2: banana/cherry tie on score -> term asc breaks it
    assert got[(2, 1)][0] == "banana" and got[(2, 2)][0] == "cherry"
    assert got[(3, 1)][0] == "cherry" and got[(3, 2)][0] == "durian"


def test_script_detection(spark):
    from doc_agent_spark.functions import textfns

    rows = [
        (1, "plain english text"),
        (2, "привет мир как дела сегодня"),
        (3, "γεια σου κοσμε"),
        (4, "你好世界再见"),
        (5, "שלום עולם"),
        (6, "mixed привет but mostly english words here"),
        (7, "12345 !!!"),
    ]
    df = spark.createDataFrame(rows, "i long, t string")
    got = {
        r.i: (r.d, list(r.c))
        for r in df.select(
            "i",
            textfns.dominant_script(F.col("t")).alias("d"),
            textfns.script_counts(F.col("t")).alias("c"),
        ).collect()
    }
    assert got[1][0] == "Latin"
    assert got[2][0] == "Cyrillic"
    assert got[3][0] == "Greek"
    assert got[4][0] == "Han" and got[4][1][3] == 6
    assert got[5][0] == "Hebrew"
    assert got[6][0] == "Latin"      # majority wins
    assert got[7][0] == "none"


def test_pmi_collocations(spark):
    import math

    from doc_agent_spark.operators import search

    # 'x y' always co-occur (5 docs), 'x z' once, all terms df >= 2
    rows = [(i, "x y filler" + str(i)) for i in range(5)] + [
        (5, "x z"), (6, "z w"), (7, "z w"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.term_a, r.term_b): (r.df_ab, r.pmi)
        for r in search.pmi_collocations(docs, min_df=2, k=50).collect()
    }
    n = 8
    assert got[("x", "y")] == (5, round(math.log(5 * n / (6 * 5)), 6))
    assert got[("w", "z")] == (2, round(math.log(2 * n / (2 * 3)), 6))
    assert got[("x", "z")] == (1, round(math.log(1 * n / (6 * 3)), 6))
    # rare fillers (df filter) never pair
    assert not any("filler" in a or "filler" in b for a, b in got)


def test_phrase_match_counts_and_overlaps(spark):
    """Contiguous-phrase semantics: counts every start offset (overlapping
    occurrences included), order matters, bag-of-words matches don't."""
    rows = [
        (1, "spark join spark join window"),   # 2 hits
        (2, "join spark window"),              # reversed order: no hit
        (3, "spark and join"),                 # non-contiguous: no hit
        (4, "a a a a"),                        # overlapping self-phrase
        (5, ""),                               # empty doc survives ANSI mode
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.id: r.n_hits for r in
           search.phrase_match(docs, ["spark", "join"]).collect()}
    assert got == {1: 2}
    overl = {r.id: r.n_hits for r in
             search.phrase_match(docs, ["a", "a"]).collect()}
    assert overl == {4: 3}


def test_proximity_min_distance(spark):
    rows = [
        (1, "spark x x x window"),             # dist 4
        (2, "window spark"),                   # dist 1 either direction
        (3, "spark a spark window b spark"),   # closest pair wins: 1
        (4, "spark only here"),                # missing term_b: dropped
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.id: r.min_dist for r in
           search.proximity_pairs(docs, "spark", "window").collect()}
    assert got == {1: 4, 2: 1, 3: 1}


def test_phrase_and_proximity_zero_shuffle(spark, texts):
    for df in (
        search.phrase_match(texts, ["quick", "brown"]),
        search.proximity_pairs(texts, "quick", "dog"),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "Python" not in plan


def test_phrase_proximity_match_sql_mirrors(spark):
    import duckdb

    rows = [
        (i, ("spark join window data " * (i % 3 + 1)) if i % 2 == 0
         else "window the spark stream join batch spark")
        for i in range(20)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    con = duckdb.connect()
    con.execute("SET threads=2")
    con.register("t", docs.toPandas())
    W = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), w -> w <> '')"

    sp = sorted((r.id, r.n_hits) for r in
                search.phrase_match(docs, ["spark", "join"]).collect())
    du = sorted(map(tuple, con.execute(
        search.phrase_sql(W, "t", "doc_id", ["spark", "join"])).fetchall()))
    assert sp == du

    sp = sorted((r.id, r.min_dist) for r in
                search.proximity_pairs(docs, "spark", "window").collect())
    du = sorted(map(tuple, con.execute(
        search.proximity_sql(W, "t", "doc_id", "spark", "window")).fetchall()))
    assert sp == du


def test_mmr_demotes_near_duplicates(spark):
    """MMR: the #2-relevance doc is a near-dup of #1, so diversity picks
    the less-relevant-but-different doc 3 at step 2."""
    rows = [
        (1, 0.95, [1.0, 0.0, 0.0, 0.0]),
        (2, 0.94, [0.99, 0.1, 0.0, 0.0]),   # near-dup of 1
        (3, 0.80, [0.0, 1.0, 0.0, 0.0]),
        (4, 0.75, [0.0, 0.98, 0.2, 0.0]),   # near-dup of 3
        (5, 0.70, [0.0, 0.0, 1.0, 0.0]),
    ]
    cands = spark.createDataFrame(
        rows, "id long, score double, embedding array<double>")
    out = search.mmr_rerank(cands, k=3, lam=0.7).orderBy("rank").collect()
    assert [r.id for r in out] == [1, 3, 5]
    assert out[0].mmr == 0.95                    # first pick: pure relevance
    assert all(out[i].mmr > out[i + 1].mmr for i in range(2))


def test_mmr_matches_sql_mirror(spark):
    import duckdb

    # deterministic pseudo-random float32-ish embeddings
    rows = [
        (i, round(1.0 - i * 0.013, 6),
         [((i * 7 + j * 13) % 17 - 8) / 8.0 for j in range(8)])
        for i in range(20)
    ]
    cands = spark.createDataFrame(
        rows, "id long, score double, embedding array<double>")
    got = sorted(
        (r.rank, r.id, r.rel, r.mmr)
        for r in search.mmr_rerank(cands, k=8, lam=0.7).collect()
    )
    con = duckdb.connect()
    con.execute("SET threads=2")
    con.register("c0", cands.toPandas())
    sql = search.mmr_sql(
        "SELECT id, score AS rel, embedding AS emb FROM c0", k=8, lam=0.7)
    want = sorted(map(tuple, con.execute(sql).fetchall()))
    assert got == want


def test_mmr_k_exceeds_candidates(spark):
    rows = [(1, 0.9, [1.0, 0.0]), (2, 0.8, [0.0, 1.0])]
    cands = spark.createDataFrame(
        rows, "id long, score double, embedding array<double>")
    out = search.mmr_rerank(cands, k=10).collect()
    assert len(out) == 2


def test_verify_pairs_jaccard_zero_shingle_pair_dropped(spark):
    """A candidate pair of shingle-less docs (< ngram tokens each) has a
    0/0 jaccard — must drop at the filter, not DIVIDE_BY_ZERO the job
    under Spark 4's ANSI default (DuckDB's x/0 → NULL does the same)."""
    docs = spark.createDataFrame(
        [(1, "hi there"), (2, "hi there"),
         (3, "the quick brown fox jumps over the lazy dog"),
         (4, "the quick brown fox jumps over the lazy cat")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2), (3, 4)], "id_a long, id_b long")
    out = dedup.verify_pairs_jaccard(pairs, docs, threshold=0.1).collect()
    assert [(r.id_a, r.id_b) for r in out] == [(3, 4)]


def test_minhash_band_params_validated(spark, texts):
    for k, bands in [(8, 16), (10, 4), (8, 0)]:
        with pytest.raises(ValueError):
            dedup.minhash_band_table(texts, k=k, bands=bands)
        with pytest.raises(ValueError):
            dedup.minhash_band_structs(F.col("text"), k=k, bands=bands)


def test_rerank_duplicate_terms_count_once(spark):
    """Coverage denominator must count DISTINCT terms: a duplicated query
    term would otherwise halve coverage for every doc."""
    cands = spark.createDataFrame(
        [(1, 0.5, "spark joins are fast")], "id long, score double, content string"
    )
    a = search.rerank(cands, ["spark"]).collect()[0]
    b = search.rerank(cands, ["spark", "spark"]).collect()[0]
    assert a.rerank_score == b.rerank_score == pytest.approx(0.715)
    with pytest.raises(ValueError):
        search.rerank(cands, [])


def test_mmr_zero_vector_candidate_no_crash(spark):
    """An all-zero embedding (failed-embed/padding row) must not
    ZeroDivisionError the greedy — and the SQL mirror must agree."""
    import duckdb

    rows = [
        (1, 0.9, [1.0, 0.0, 0.0, 0.0]),
        (2, 0.8, [0.0, 0.0, 0.0, 0.0]),   # zero vector
        (3, 0.7, [0.0, 1.0, 0.0, 0.0]),
    ]
    cands = spark.createDataFrame(
        rows, "id long, score double, embedding array<double>")
    got = sorted(
        (r.rank, r.id, r.rel, r.mmr)
        for r in search.mmr_rerank(cands, k=3, lam=0.7).collect()
    )
    assert len(got) == 3
    con = duckdb.connect()
    con.register("c0", cands.toPandas())
    sql = search.mmr_sql(
        "SELECT id, score AS rel, embedding AS emb FROM c0", k=3, lam=0.7)
    want = sorted(map(tuple, con.execute(sql).fetchall()))
    assert got == want


def test_ivf_topk_string_ids(spark):
    """String-keyed corpora route through the hash-key/stride-degrade
    codebook guards instead of an empty-matrix numpy crash."""
    rows = [
        (f"doc-{i:04d}", [((i * 7 + j * 13) % 17 - 8) / 8.0 for j in range(8)])
        for i in range(60)
    ]
    emb = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    q = [((3 * 7 + j * 13) % 17 - 8) / 8.0 for j in range(8)]
    out = similarity.ivf_topk(
        emb, q, k=5, centroid_stride=10, nprobe=2, id_col="vec_id"
    ).collect()
    assert 1 <= len(out) <= 5
    assert all(isinstance(r.id, str) for r in out)


def test_bm25_for_terms_duplicate_terms_no_fanout(spark, texts):
    terms_dup = spark.createDataFrame(
        [("quick",), ("quick",), ("lazy",)], "term string")
    terms = spark.createDataFrame([("quick",), ("lazy",)], "term string")
    a = sorted(map(tuple, search.bm25_scores_for_terms(texts, terms_dup).collect()))
    b = sorted(map(tuple, search.bm25_scores_for_terms(texts, terms).collect()))
    assert a == b
