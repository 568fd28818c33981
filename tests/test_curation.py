"""Training-data curation operators: PII redaction, duplicate clustering
(connected components), deterministic sampling."""

from __future__ import annotations

import hashlib

import pytest

from pyspark.sql import functions as F

from doc_agent_spark.functions import redact
from doc_agent_spark.operators import dedup, sampling


def test_redact_pii_all_categories(spark):
    rows = [(1, "mail a.b+c@ex-ample.co.uk ssn 123-45-6789 acct 123456789012 "
                "tel +44 (0) 555-123-9876 ok 42")]
    df = spark.createDataFrame(rows, "id long, text string")
    out = df.select(redact.redact_pii(F.col("text")).alias("t")).collect()[0].t
    assert out == "mail <EMAIL> ssn <SSN> acct <ACCT> tel <PHONE> ok 42"


def test_redact_counts_do_not_double_count(spark):
    df = spark.createDataFrame(
        [(1, "x@y.io and 123-45-6789 and 12345678901")], "id long, text string"
    )
    c = df.select(redact.pii_counts(F.col("text")).alias("c")).collect()[0].c
    assert (c.emails, c.ssns, c.accts, c.phones) == (1, 1, 1, 0)


def test_dup_clusters_transitive(spark):
    # chain 1-2-3 plus island 10-11: min-label must propagate transitively
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    out = {r.id: r.cluster_id for r in dedup.dup_clusters(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_dup_clusters_long_chain_converges(spark):
    n = 12
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    out = {r.id: r.cluster_id for r in dedup.dup_clusters(pairs).collect()}
    assert set(out.values()) == {0} and len(out) == n + 1


def test_dup_clusters_raises_when_diameter_exceeds_max_iter(spark):
    # a 9-edge chain needs >3 min-label rounds: silent unconverged output
    # would split the one real cluster — the contract is to raise instead
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.dup_clusters(pairs, max_iter=3)
    # and a budget >= diameter succeeds on the same input
    out = {r.id: r.cluster_id for r in dedup.dup_clusters(pairs, max_iter=12).collect()}
    assert set(out.values()) == {0}


def test_star_matches_minlabel_on_varied_graph_shapes(spark):
    # large-star/small-star contraction must produce the exact min-label
    # cluster map on every component shape: chains (worst case for
    # min-label), cliques (the LSH-banding common case), hubs, random
    # sparse graphs with self-loops, and degenerate self-loop-only nodes
    import random

    rng = random.Random(7)
    cases = {
        "chain": [(i, i + 1) for i in range(40)],
        "cliques": [(i, j) for i in range(5) for j in range(i + 1, 5)]
        + [(10 + i, 10 + j) for i in range(4) for j in range(i + 1, 4)],
        "hub": [(0, i) for i in range(1, 20)],
        "random": [(rng.randrange(100), rng.randrange(100)) for _ in range(80)],
        "selfloop_only": [(5, 5), (9, 9), (5, 9), (42, 42)],
    }
    for name, edges in cases.items():
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        a = sorted(map(tuple, dedup.dup_clusters(df, max_iter=100).collect()))
        b = sorted(map(tuple, dedup.dup_clusters_star(df).collect()))
        assert a == b, f"{name}: star disagrees with min-label"


def test_pick_canonical_by_score_with_tiebreak(spark):
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)], "id long, cluster_id long"
    )
    scored = spark.createDataFrame(
        [(1, 5.0), (2, 9.0), (3, 9.0), (7, 1.0), (8, 1.0)], "id long, score double"
    )
    out = {
        r.cluster_id: (r.canonical_id, r.canonical_score)
        for r in dedup.pick_canonical(clusters, scored).collect()
    }
    # cluster 1: 2 and 3 tie on score 9.0 -> smallest id wins
    assert out == {1: (2, 9.0), 7: (7, 1.0)}


def test_pick_canonical_ignores_unscored_members(spark):
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1)], "id long, cluster_id long"
    )
    scored = spark.createDataFrame([(1, 3.0)], "id long, score double")
    out = dedup.pick_canonical(clusters, scored).collect()
    # member 2 has no score row: it cannot be elected
    assert [(r.cluster_id, r.canonical_id) for r in out] == [(1, 1)]


def test_star_converges_logarithmically_on_chains(spark):
    # a 60-edge chain needs 60+ min-label rounds but only O(log n) star
    # rounds — the reason the star variant is the extreme-scale path
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "id_a long, id_b long"
    )
    out = {r.id: r.cluster_id for r in dedup.dup_clusters_star(pairs, max_iter=10).collect()}
    assert set(out.values()) == {0} and len(out) == 61


def _expected_keep(key, fraction, seed="s42"):
    h = hashlib.md5(f"{seed}:{key}".encode()).hexdigest()[:8]
    return h < sampling.hex_threshold(fraction)


def test_bernoulli_sample_matches_reference_hash(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    kept = {r.doc_id for r in sampling.sample_bernoulli(df, 0.3, "doc_id").collect()}
    expected = {i for i in range(500) if _expected_keep(i, 0.3)}
    assert kept == expected
    assert 0.2 < len(kept) / 500 < 0.4


def test_stratified_sample_respects_fractions(spark):
    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = sampling.sample_stratified(
        df, {"a": 1.0, "b": 0.0}, strata_col="lang", key_col="doc_id"
    ).collect()
    assert {r.lang for r in out} == {"a"}
    assert len(out) == 200  # fraction 1.0 keeps every row, 0.0 none


def test_sampling_stable_under_repartition(spark):
    df = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    a = {r.doc_id for r in sampling.sample_bernoulli(df, 0.5, "doc_id").collect()}
    b = {r.doc_id for r in
         sampling.sample_bernoulli(df.repartition(17), 0.5, "doc_id").collect()}
    assert a == b


def test_sampling_is_pushdown_friendly(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        sampling.sample_bernoulli(docs.select("doc_id"), 0.5, "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Python" not in plan


def test_weighted_sample_tracks_weight(spark):
    from pyspark.sql import functions as F

    from doc_agent_spark.operators import sampling

    rows = [(i, 0.9 if i % 2 == 0 else 0.1) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    kept = sampling.sample_weighted(df, F.col("w"), key_col="doc_id")
    counts = {r.w: r.n for r in kept.groupBy("w").agg(F.count("*").alias("n")).collect()}
    assert 0.8 < counts[0.9] / 1000 <= 1.0   # ≈ 90% of the heavy stratum
    assert 0.0 < counts[0.1] / 1000 < 0.2    # ≈ 10% of the light stratum
    # weight 1.0 / 0.0 degenerate cases
    edge = spark.createDataFrame([(1, 1.0), (2, 0.0)], "doc_id long, w double")
    got = [r.doc_id for r in sampling.sample_weighted(edge, F.col("w"), "doc_id").collect()]
    assert got == [1]


def test_mixture_rates_and_resample(spark):
    from pyspark.sql import functions as F

    from doc_agent_spark.operators import sampling

    # domain a: 6000 docs, b: 3000, c: 1000; equal per-doc mass ⇒ observed
    # shares 0.6/0.3/0.1; target 1/3 each ⇒ most underrepresented (c) keeps
    # 100%, a keeps (1/3)/0.6 scaled by c's peak, b likewise
    rows = [(i, "a" if i < 6000 else "b" if i < 9000 else "c") for i in range(10000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    third = 1.0 / 3.0
    targets = {"a": third, "b": third, "c": 1.0 - 2 * third}
    rates = sampling.mixture_rates(df, targets, "source")
    assert rates["c"] == 1.0
    assert abs(rates["a"] - (third / 0.6) / (third / 0.1)) < 1e-12
    assert abs(rates["b"] - (third / 0.3) / (third / 0.1)) < 1e-12

    kept = sampling.resample_to_mixture(df, targets, "source", key_col="doc_id")
    counts = {
        r.source: r.n
        for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert counts["c"] == 1000  # peak domain kept in full
    # kept mixture ≈ target thirds (hash-uniform tolerance)
    total = sum(counts.values())
    for d in targets:
        assert abs(counts[d] / total - third) < 0.05
    # determinism under layout
    again = sampling.resample_to_mixture(
        df.repartition(11), targets, "source", key_col="doc_id"
    )
    assert sorted(map(tuple, kept.collect())) == sorted(map(tuple, again.collect()))


def test_mixture_rates_rejects_bad_inputs(spark):
    import pytest as pt

    from doc_agent_spark.operators import sampling

    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with pt.raises(ValueError):
        sampling.mixture_rates(df, {}, "source")
    with pt.raises(ValueError):
        sampling.mixture_rates(df, {"a": 0.7, "b": 0.7}, "source")
    with pt.raises(ValueError):  # no mass in any target domain
        sampling.mixture_rates(df, {"zz": 1.0}, "source")


def test_cap_per_domain_binds_only_over_cap(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, "heavy" if i % 2 == 0 else f"tail{i % 5}") for i in range(200)],
        "doc_id long, domain string",
    )
    kept = sampling.cap_per_domain(df, cap=25, domain_col="domain", key_col="doc_id")
    sizes = {r.domain: r.n for r in kept.groupBy("domain").agg(F.count("*").alias("n")).collect()}
    assert sizes["heavy"] == 25           # 100 rows truncated to the cap
    for d in ("tail0", "tail1", "tail2", "tail3", "tail4"):
        assert sizes[d] == 20  # 20 < cap would truncate; these sit under it
    # under-cap domains pass through complete
    assert sum(sizes[d] for d in sizes if d != "heavy") == 100


def test_cap_per_domain_matches_global_window_and_is_layout_stable(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, f"d{i % 3}") for i in range(90)], "doc_id long, domain string"
    )
    split = sampling.cap_per_domain(df, cap=7, domain_col="domain", key_col="doc_id")
    h = F.substring(F.md5(F.concat(F.lit("cap42:"), F.col("doc_id").cast("string"))), 1, 8)
    w = Window.partitionBy("domain").orderBy(h, F.col("doc_id"))
    plain = df.withColumn("_r", F.row_number().over(w)).filter("_r <= 7").drop("_r")
    assert sorted(map(tuple, split.collect())) == sorted(map(tuple, plain.collect()))
    again = sampling.cap_per_domain(
        df.repartition(13), cap=7, domain_col="domain", key_col="doc_id"
    )
    assert sorted(map(tuple, split.collect())) == sorted(map(tuple, again.collect()))


def test_cap_per_domain_rejects_zero_cap(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, domain string")
    with pytest.raises(ValueError):
        sampling.cap_per_domain(df, cap=0, domain_col="domain", key_col="doc_id")


def test_cap_per_domain_randomized_vs_window(spark):
    """Seeded Zipfian-ish domains, assorted caps: split-path output equals
    the plain global window on every run."""
    import random

    from pyspark.sql import Window

    rng = random.Random(13)
    rows = [(i, f"d{min(int(rng.expovariate(0.8)), 9)}") for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    for cap in (1, 3, 17, 400):
        got = sampling.cap_per_domain(df, cap=cap, domain_col="domain", key_col="doc_id")
        h = F.substring(
            F.md5(F.concat(F.lit("cap42:"), F.col("doc_id").cast("string"))), 1, 8
        )
        w = Window.partitionBy("domain").orderBy(h, F.col("doc_id"))
        ref = df.withColumn("_r", F.row_number().over(w)).filter(
            F.col("_r") <= cap
        ).drop("_r")
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, ref.collect())), cap


def test_token_budget_cap_prefix_rule(spark):
    """UniMax cap: over-budget langs truncate at the prefix-budget boundary
    (cum-before < budget), under-budget langs pass through whole, every
    lang keeps at least one doc even when its first doc exceeds budget."""
    rows = (
        [(i, "en", 40) for i in range(50)]          # mass 2000, over budget
        + [(100 + i, "de", 30) for i in range(5)]   # mass 150, under
        + [(200, "fr", 10_000)]                     # single huge doc
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tok long")
    out = sampling.token_budget_cap(
        df, budget=400, lang_col="lang", key_col="doc_id", weight_col="n_tok"
    )
    got = out.collect()
    by_lang = {}
    for r in got:
        by_lang.setdefault(r.lang, []).append(r.doc_id)
    assert sorted(by_lang["de"]) == [100 + i for i in range(5)]  # untouched
    assert by_lang["fr"] == [200]  # first doc always kept
    # en kept mass: strictly-earlier mass < 400 ⇒ exactly 10 docs of 40,
    # the 11th has cum_before = 400 (not < 400)
    assert len(by_lang["en"]) == 10
    # layout-invariant
    again = sampling.token_budget_cap(
        df.repartition(7), budget=400, lang_col="lang",
        key_col="doc_id", weight_col="n_tok",
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_token_budget_cap_matches_sql_mirror(spark):
    import duckdb

    rows = [(i, f"l{i % 4}", (i * 7) % 90 + 1) for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tok long")
    out = sampling.token_budget_cap(
        df, budget=300, lang_col="lang", key_col="doc_id", weight_col="n_tok"
    )
    spark_rows = sorted(map(tuple, out.collect()))
    con = duckdb.connect()
    con.register("t", df.toPandas())
    sql = sampling.token_budget_cap_sql(
        "t", budget=300, lang_expr="lang", key_expr="doc_id",
        weight_expr="n_tok",
    )
    duck_rows = sorted(map(tuple, con.execute(sql).fetchall()))
    assert duck_rows == spark_rows


def test_token_budget_cap_rejects_zero_budget(spark):
    df = spark.createDataFrame([(1, "en", 5)], "doc_id long, lang string, n_tok long")
    with pytest.raises(ValueError):
        sampling.token_budget_cap(
            df, budget=0, lang_col="lang", key_col="doc_id", weight_col="n_tok"
        )


def test_blocklist_hits_tokens_not_substrings(spark):
    from doc_agent_spark.functions import textfns

    df = spark.createDataFrame(
        [
            (1, "a dup row appears here"),          # 1 hit
            (2, "dupont is fine and so is update"),  # substrings don't count
            (3, "forbidden word plus dup twice dup"),  # 3 hits
            (4, "clean text only"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.h
        for r in df.select(
            "doc_id", textfns.blocklist_hits(F.col("text")).alias("h")
        ).collect()
    }
    assert got == {1: 1, 2: 0, 3: 3, 4: 0}


def test_cap_per_domain_null_domain_is_one_capped_group(spark):
    """NULL domains must not bypass the cap: equi-joins never match NULL
    keys, but the window (and the DuckDB oracle) group NULLs as one capped
    partition — the null-safe routing keeps both paths in agreement."""
    from doc_agent_spark.operators import sampling

    rows = [(i, None if i < 40 else "d1") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    kept = sampling.cap_per_domain(df, cap=5, domain_col="domain", key_col="doc_id")
    by_dom = {r["domain"]: r["n"] for r in
              kept.groupBy("domain").agg(F.count("*").alias("n")).collect()}
    assert by_dom[None] == 5       # 40 NULL-domain rows capped at 5
    assert by_dom["d1"] == 5       # 10 d1 rows capped at 5 as well


def test_token_budget_cap_duplicate_keys_rows_frame(spark):
    """Two rows sharing key_col are window PEERS: the default RANGE frame
    would give each twin the other's weight in its prefix sum (both
    dropped); the documented strictly-earlier rule keeps one."""
    # budget 20 < weight 30 discriminates the frames: ROWS gives twin #1
    # cum_before 0 (kept) and twin #2 cum_before 30 (dropped); RANGE gives
    # BOTH 30 (both dropped — even the language's first doc, rule broken)
    rows = [(7, "en", 30), (7, "en", 30), (99, "de", 5)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tok long")
    out = sampling.token_budget_cap(
        df, budget=20, lang_col="lang", key_col="doc_id", weight_col="n_tok"
    ).collect()
    en = [r for r in out if r.lang == "en"]
    assert len(en) == 1
    # and the SQL mirror (explicit ROWS frame) agrees
    import duckdb
    con = duckdb.connect()
    con.register("t", df.toPandas())
    sql = sampling.token_budget_cap_sql(
        "t", budget=20, lang_expr="lang", key_expr="doc_id", weight_expr="n_tok")
    duck = con.execute(sql).fetchall()
    assert sorted(map(tuple, out)) == sorted(map(tuple, duck))
