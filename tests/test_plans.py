"""Physical-plan assertions — the plans we WANT at 100 TB, not just plans
that pass (SURVEY §4.2). Each test pins a scale property: broadcast where a
side is small, zero exchanges where the pipeline is narrow, pushdown/pruning
reaching the parquet scan, and whole-stage codegen on the expression path."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from doc_agent_spark.operators import extractor
from doc_agent_spark.sources.tables import spans_from_documents


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_q5_broadcasts_small_dims(spark, sf_dir):
    plan = _plan(entrymod.q5_nation_revenue(spark, sf_dir))
    assert "BroadcastHashJoin" in plan  # nation/region must never shuffle


def test_extraction_pipeline_is_narrow(docs):
    """The flagship extraction plan must contain NO shuffle: scan →
    derive spans (exprs) → one Arrow-batched Python stage. Partition count
    in == partition count out; nothing exchanges."""
    plan = _plan(extractor.extract(spans_from_documents(docs)))
    assert "Exchange" not in plan
    assert "MapInArrow" in plan or "MapInPandas" in plan or "ArrowEvalPython" in plan


def test_filter_pushdown_reaches_scan(docs):
    plan = _plan(docs.filter(F.col("doc_id") == 42).select("doc_id", "lang"))
    assert "PushedFilters: [IsNotNull(doc_id), EqualTo(doc_id,42)]" in plan


def test_column_pruning_reaches_scan(docs):
    """A 2-column projection must not read `text` (the heavy column)."""
    plan = _plan(docs.select("doc_id", "lang"))
    assert "ReadSchema: struct<doc_id:bigint,lang:string>" in plan


def test_topk_is_take_ordered_not_global_sort(spark, sf_dir):
    plan = _plan(entrymod.top_orders(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan  # top-k never global-sorts


def test_relational_queries_stay_jvm_side(spark, sf_dir):
    """No Python evaluation in any pure-relational/expression query — the
    slow path is reserved for the extraction/media UDFs only."""
    for name in ["q1_pricing_summary", "q3_shipping_priority", "q5_nation_revenue",
                 "events_sessions", "page_assembly", "dedup_exact", "cosine_topk",
                 "minhash_lsh_pairs", "lang_id_counts", "quality_tokens"]:
        plan = _plan(getattr(entrymod, name)(spark, sf_dir))
        assert "Python" not in plan, f"{name} fell off the JVM path"
        assert "BatchEvalPython" not in plan, f"{name} uses row-at-a-time Python"


def test_whole_stage_codegen_on_expression_path(spark, sf_dir):
    df = entrymod.q1_pricing_summary(spark, sf_dir)
    df.collect()  # AQE finalizes the plan (and its codegen stages) on execution
    plan = _plan(df)
    # '*(N) ' prefixes mark whole-stage-codegen stages in the plan string;
    # both the partial (map-side) and final aggregate must be inside one
    assert "*(1) HashAggregate" in plan and "*(2) HashAggregate" in plan


def test_hydrate_broadcasts_results_not_corpus(spark, sf_dir):
    plan = _plan(entrymod.search_hydrate(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_partial_aggregation_before_shuffle(spark, sf_dir):
    """q1 must do map-side partial aggregation (HashAggregate appears both
    below and above the exchange)."""
    plan = _plan(entrymod.q1_pricing_summary(spark, sf_dir))
    assert plan.count("HashAggregate") >= 2


def test_rrf_and_eval_have_no_global_window(spark, sf_dir):
    """Round-1 weakness: partition-less Window = single-task sort of the full
    list. The top_n RRF form and the single-list eval now rank via
    TakeOrderedAndProject + bounded self-join — no Window node at all."""
    for name in ["rrf_fusion", "retrieval_eval"]:
        plan = _plan(getattr(entrymod, name)(spark, sf_dir))
        assert "Window" not in plan, f"{name} regressed to a global window"
        assert "TakeOrderedAndProject" in plan


def test_eval_by_query_window_is_partitioned(spark, sf_dir):
    plan = _plan(entrymod.retrieval_eval_by_query(spark, sf_dir))
    win_lines = [ln for ln in plan.splitlines() if "Window" in ln]
    assert win_lines, "expected a (partitioned) window for per-query ranking"
    for ln in win_lines:
        assert "query_id" in ln, f"window not partitioned by query_id: {ln}"


def test_ivf_uses_broadcast_joins_not_literal_centroids(spark, sf_dir):
    """The IVF codebook must flow through the plan as a broadcast relation:
    probe/candidate joins are BroadcastHashJoins and no giant literal
    centroid array appears in the expression tree (round-1 weakness)."""
    plan = _plan(entrymod.ivf_topk(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "array_max" not in plan  # the old literal-argmax mechanism


def test_curation_exprs_are_narrow_jvm_projections(spark, sf_dir):
    """PII redaction, sampling, and token histogram input must stay pure
    JVM projections — no shuffle before the (histogram) aggregation, no
    Python anywhere."""
    for name in ["pii_redaction", "stratified_sample"]:
        plan = _plan(getattr(entrymod, name)(spark, sf_dir))
        assert "Exchange" not in plan, f"{name} shuffles"
        assert "Python" not in plan, f"{name} fell off the JVM path"
    plan = _plan(entrymod.token_histogram(spark, sf_dir))
    assert "Python" not in plan
    assert plan.count("HashAggregate") >= 2  # map-side partial agg


def test_semantic_search_hydration_broadcasts(spark, sf_dir):
    plan = _plan(entrymod.semantic_search_e2e(spark, sf_dir))
    assert "BroadcastHashJoin" in plan       # k-row results into chunk/doc joins
    assert "TakeOrderedAndProject" in plan   # top-k never global-sorts
    assert "CartesianProduct" not in plan


def test_lsh_verified_pairs_all_equi_joins(spark, sf_dir):
    """Generate-then-verify must stay equi-join shaped: no nested-loop or
    cartesian fallback anywhere in candidate generation or verification."""
    plan = _plan(entrymod.lsh_verified_pairs(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ann_lsh_and_graph_build_stay_equi_join_shaped(spark, sf_dir):
    """Round-3 Arrow-bucketed paths: candidate generation must remain an
    equi-join on (tbl, bucket) — no cartesian/nested-loop fallback — and the
    ANN top-k must finish with TakeOrderedAndProject."""
    from doc_agent_spark.operators import graph_ann
    from doc_agent_spark.sources.tables import load

    plan = _plan(entrymod.ann_lsh_topk(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan
    g = graph_ann.build_knn_graph(load(spark, sf_dir, "embeddings"), m=4, dim=64)
    gplan = _plan(g)
    assert "CartesianProduct" not in gplan
    assert "BroadcastNestedLoopJoin" not in gplan


def test_conversion_funnel_single_aggregation_pass(spark, sf_dir):
    """Each union arm scans events exactly once and neither self-joins:
    the funnel derives stage times from per-user arrays (not joins), and
    the cohort-retention arm derives the cohort from a window min (not a
    join against a per-user aggregate) — two arms, two scans, zero
    joins."""
    plan = _plan(entrymod.conversion_funnel(spark, sf_dir))
    assert "Join" not in plan  # arrays + window min, never self-joins
    assert plan.count("Scan parquet") == 2  # one per union arm


def test_exact_dedup_never_shuffles_text(spark, sf_dir):
    """The dedup shuffle key is the md5 — the optimized plan's exchange input
    must not carry the raw text column."""
    df = entrymod.dedup_exact(spark, sf_dir)
    plan = _plan(df)
    exchange_idx = plan.find("Exchange")
    assert exchange_idx != -1
    below = plan[exchange_idx:]
    assert "text_md5" in below and ", text" not in below


def test_quality_tokens_bigram_agg_stays_jvm_and_partial(spark, sf_dir):
    """The repetition-signal additions must not introduce Python stages, a
    Window, or a cartesian product: the top-bigram path is explode →
    partial-agg groupBy → equi-join back."""
    plan = _plan(entrymod.quality_tokens(spark, sf_dir))
    for bad in ("BatchEvalPython", "ArrowEvalPython", "Window", "CartesianProduct"):
        assert bad not in plan
    assert "partial_count" in plan or "partial" in plan.lower()


def test_line_strip_shuffles_hashes_not_lines(spark, sf_dir):
    """strip_duplicated_lines: the boilerplate-set aggregation and the
    anti-join key is the 32-byte line md5; the raw line text must not ride
    any exchange, and the reassembly needs no Window."""
    from doc_agent_spark.operators import dedup as dd

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", entrymod._page_weave().alias("text")
    )
    plan = _plan(dd.strip_duplicated_lines(docs))
    assert "Window" not in plan and "CartesianProduct" not in plan
    first_exchange = plan.find("Exchange")
    assert first_exchange != -1
    # the distinct→groupBy exchanges below the boilerplate-set agg carry
    # only (id, line_md5) — never the line text column
    df_agg = plan.find("df_count")
    assert df_agg != -1
    below = plan[df_agg:]
    ex = below.find("Exchange")
    assert ex != -1
    assert "line_md5" in below[ex : ex + 400]


def test_pack_sequences_single_shard_exchange(spark, sf_dir):
    """Sequence packing must be ONE hash exchange on `shard` (the per-shard
    window) and nothing else: no global-order Exchange(SinglePartition), no
    Python stage, and the sort feeding the window carries only
    (shard, order_hash, key, tokens) — never document text."""
    plan = _plan(entrymod.pack_sequences(spark, sf_dir))
    assert plan.count("Exchange") == 1
    assert "hashpartitioning(shard" in plan
    assert "SinglePartition" not in plan
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert bad not in plan
    assert "Window" in plan and "Generate explode" in plan
    # everything downstream of the shuffle (printed ABOVE the Exchange node)
    # operates on (shard, order_hash, key, token counts) — never `text`:
    # the token count is projected BEFORE the exchange, so the heavy column
    # never rides the shuffle
    assert "text#" not in plan.split("Exchange")[0]


def test_dataset_split_is_zero_shuffle_projection(spark, sf_dir):
    plan = _plan(entrymod.dataset_split(spark, sf_dir))
    assert "Exchange" not in plan
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert bad not in plan


def test_top_trigrams_partial_agg_and_topk(spark, sf_dir):
    """Doc-frequency counting must partial-aggregate before its exchange
    and take the top-k without a global sort."""
    plan = _plan(entrymod.top_trigrams(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "partial_count" in plan or "partial" in plan.lower()
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert bad not in plan


def test_assemble_windows_is_join_plus_one_agg(spark):
    """Window materialization must be an equi-join on the doc key plus one
    window-keyed aggregation — no Python stage, no cartesian product, and
    the heavy token arrays only enter AFTER the plan-side explode is done
    (the plan side carries offsets only)."""
    from doc_agent_spark.functions import textfns
    from doc_agent_spark.operators import packing

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma " * (i + 1)) for i in range(20)],
        "doc_id long, text string",
    )
    staged = docs.select(
        "doc_id", textfns.bpe_ish_token_count(F.col("text")).alias("n_tokens")
    )
    plan_df = packing.pack_chunks(staged, "n_tokens", "doc_id", budget=16, n_shards=2)
    wins = packing.assemble_windows(
        plan_df, docs, tokens=textfns.bpe_ish_tokens(F.col("text")), key_col="doc_id"
    )
    plan = _plan(wins)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert bad not in plan
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan or "ShuffledHashJoin" in plan


def test_span_removal_shuffles_hash_prefixes_not_tokens(spark, sf_dir):
    """remove_duplicated_spans: the shingle-occurrence aggregate and the
    semi-join key is the 16-hex-char md5 prefix; the token arrays must not
    ride those exchanges (they re-enter only at the final per-doc join)."""
    from doc_agent_spark.operators import dedup as dd

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    plan = _plan(dd.remove_duplicated_spans(docs, k=5, min_count=2))
    for bad in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct",
                "Window"):
        assert bad not in plan
    # every hashpartitioning exchange keys on sh or id — never ws/text
    import re

    for m in re.finditer(r"hashpartitioning\(([^)]*)\)", plan):
        keys = m.group(1)
        assert "ws" not in keys and "text" not in keys, keys


def test_bloom_probe_broadcasts_the_word_table(spark, sf_dir):
    """The bloom filter side is constant-size (m/32 words): the probe join
    must broadcast it, never shuffle the batch."""
    from doc_agent_spark.operators import sketches

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = sketches.bloom_build(docs, "text")
    probed = sketches.bloom_probe(docs, words, "doc_id", "text")
    plan = _plan(probed)
    assert "BroadcastHashJoin" in plan


def test_cap_per_domain_single_window_over_cap_only(spark, sf_dir):
    """The quota cap routes only over-cap domains into the rank window;
    the plan carries exactly one Window, and both split joins are
    broadcast (the over-cap domain list is tiny)."""
    from doc_agent_spark.operators import sampling

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(
        sampling.cap_per_domain(docs, cap=20, domain_col="source", key_col="doc_id")
    )
    assert plan.count("Window [") == 1
    assert "BroadcastHashJoin" in plan
    # rank<=cap pushes into the window sort as a group limit (partial map-
    # side + final), so over-cap domains never fully sort either
    assert "WindowGroupLimit" in plan


def test_hash_sample_quantiles_partial_group_limit(spark, sf_dir):
    """The bottom-m hash sample must reduce BEFORE the exchange: a Partial
    WindowGroupLimit caps each task at m rows per group, so the shuffle
    carries ≤ m·groups rows per task no matter the corpus size."""
    from doc_agent_spark.operators import sketches

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    plan = _plan(
        sketches.hash_sample_quantiles(ev, "value", "event_id", "event_type", m=128)
    )
    assert "WindowGroupLimit" in plan
    assert ", Partial" in plan  # map-side reduction before the exchange
    assert plan.count("Window [") == 1


def test_kmv_overlap_merge_is_k_rows(spark, sf_dir):
    """The overlap sketch's final sort-merge sees only per-task k-mins:
    the plan ends in a TakeOrderedAndProject over the flag aggregation,
    and the sides are Arrow-reduced (PythonMapInArrow/MapInPandas) before
    any exchange."""
    from doc_agent_spark.operators import sketches

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    a = ev.filter(F.col("event_type") == "view").select("user_id")
    b = ev.filter(F.col("event_type") == "click").select("user_id")
    plan = _plan(sketches.kmv_overlap_estimate(a, b, "user_id", k=64))
    assert "TakeOrderedAndProject" in plan
    assert "MapInPandas" in plan or "PythonMapInArrow" in plan or "ArrowEvalPython" in plan


def test_nb_scoring_broadcasts_the_model(spark, sf_dir):
    """Hashed-NB: the log-odds model (n_buckets rows) and both totals rows
    broadcast; the only shuffles key on 8-byte buckets / doc ids."""
    from doc_agent_spark.operators import quality_clf

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scored = quality_clf.hashed_nb_scores(
        docs, "doc_id", "text", F.col("lang") == "en"
    )
    plan = _plan(scored)
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" in plan  # the one-row totals crossJoins


def test_url_canon_is_zero_shuffle_projection(spark, sf_dir):
    from doc_agent_spark.functions import urls

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = docs.select(
        urls.url_canonicalize(
            F.concat(F.lit("https://WWW."), F.col("source"), F.lit(".Example.COM/x"))
        )
    )
    plan = _plan(out)
    assert "Exchange" not in plan
    assert "Python" not in plan and "Arrow" not in plan


def test_salted_join_keys_include_the_salt(spark, sf_dir):
    from doc_agent_spark.plans import skew

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    small = docs.select("source").distinct().withColumn("w", F.lit(1.0))
    out = skew.salted_join(docs, small, ["source"], row_key="doc_id")
    assert "_salt" in _optimized(out)


def test_dsir_broadcasts_models_and_takeordered_topk(spark, sf_dir):
    """DSIR: both hashed-ngram models (≤ n_buckets rows) broadcast into the
    scoring join, the top-k is TakeOrderedAndProject (never a global sort),
    and nothing drops to Python."""
    from doc_agent_spark.operators import dsir

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sel = dsir.dsir_select(
        docs, docs.filter(F.col("lang") == "en"),
        k=50, n_buckets=256, id_col="doc_id",
    )
    plan = _plan(sel)
    assert "BroadcastHashJoin" in plan       # p/q models ride broadcasts
    assert "TakeOrderedAndProject" in plan   # bounded top-k, no global Sort
    assert "Python" not in plan and "ArrowEval" not in plan


def test_c4_clean_is_zero_shuffle_projection(spark, sf_dir):
    from doc_agent_spark.functions import c4rules

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    clean = c4rules.c4_clean(F.col("text"))
    out = docs.select(
        "doc_id", clean.alias("clean"),
        c4rules.c4_page_pass(F.col("text"), clean).alias("ok"),
    )
    plan = _plan(out)
    assert "Exchange" not in plan
    assert "Python" not in plan and "Arrow" not in plan


def test_justext_is_zero_shuffle_projection(spark, sf_dir):
    """jusText context smoothing is doc-local array algebra — it must stay
    inside the scan projection: no Exchange, no Python."""
    from doc_agent_spark.operators import boilerplate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = docs.select(
        "doc_id", boilerplate.justext_content(F.col("text")).alias("jt")
    )
    plan = _plan(out)
    assert "Exchange" not in plan
    assert "Python" not in plan and "Arrow" not in plan


def test_main_island_one_doc_keyed_exchange(spark, sf_dir):
    """Island selection explodes blocks then windows per doc: exactly one
    doc-keyed exchange feeds both window passes (no second shuffle for the
    ranking), and nothing drops to Python."""
    from doc_agent_spark.operators import boilerplate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(boilerplate.main_island(docs))
    # grp window, island agg, and both ranking windows all reuse the one
    # doc_id hash partitioning
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Python" not in plan and "Arrow" not in plan


def test_winnow_codegen_no_python_no_window(spark, sf_dir):
    """Winnowing is the relational form: one md5 per shingle in codegen,
    exploded window-ids, hash aggregation — no Python stage, no
    row_number window, no higher-order interpreted lambdas in the hot
    path (plan shows HashAggregate/ObjectHashAggregate, not Filter over
    lambda_variable)."""
    from doc_agent_spark.operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(dedup.winnow_groups(docs))
    assert "Python" not in plan and "Arrow" not in plan
    assert "Window" not in plan
    assert "HashAggregate" in plan


def test_tfidf_windowgrouplimit_topk(spark, sf_dir):
    """The per-doc top-k rank is WindowGroupLimit-pushed (partial limit
    before the full window sort), and no Python stage appears."""
    from doc_agent_spark.operators import search

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(search.tfidf_keywords(docs, k=3))
    assert "WindowGroupLimit" in plan
    assert "Python" not in plan and "Arrow" not in plan


def test_fuzzy_match_broadcasts_dictionary(spark):
    """The deletion-neighborhood join broadcasts the dictionary side and
    verifies with the JVM levenshtein — no Python, no cross join."""
    from doc_agent_spark.operators import fuzzy

    left = spark.createDataFrame([("acme corp",)], "left_val string")
    right = spark.createDataFrame([("acme corp",)], "right_val string")
    plan = _plan(fuzzy.fuzzy_match_del1(left, right, "left_val", "right_val"))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert "Python" not in plan


def test_pmi_broadcasts_vocab_and_topk(spark, sf_dir):
    from doc_agent_spark.operators import search

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(search.pmi_collocations(docs, min_df=5, k=20))
    assert "BroadcastHashJoin" in plan          # vocab + df sides ride broadcasts
    assert "TakeOrderedAndProject" in plan      # bounded top-k, no global sort
    assert "Python" not in plan


def test_publish_manifest_one_exchange_partial_agg(spark, sf_dir):
    """The export manifest is ONE hash aggregate: map-side partials merge
    the digest sums, a single Exchange on shard moves 3 numbers per
    (task, shard), and nothing touches Python — the text bytes never
    shuffle."""
    from doc_agent_spark.operators import publish

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = publish.shard_manifest(
        docs.select(publish.json_line("doc_id", "lang", "n_chars").alias("line"), "doc_id"),
        n_shards=8,
    )
    plan = _plan(out)
    assert plan.count("Exchange") == 1
    assert "partial_count" in plan or "partial" in plan.lower()
    assert "Python" not in plan and "Arrow" not in plan


def test_rollup_state_partial_agg_no_python(spark, sf_dir):
    """The incremental-rollup batch state is ONE hash aggregate with
    map-side partial combine (the merge algebra Spark itself uses, lifted
    to a table boundary): one Exchange on the keys, partial aggregation
    before it, no Python anywhere."""
    from doc_agent_spark.operators import incremental_agg as ia

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    state = ia.rollup_state(
        ev.select("event_type", F.hour("ts").alias("h"), "value"),
        ["event_type", "h"], "value",
    )
    plan = _plan(state)
    assert plan.count("Exchange") == 1
    assert "partial" in plan.lower()
    assert "Python" not in plan and "Arrow" not in plan


def test_merge_finalize_no_extra_shuffle(spark, sf_dir):
    """merge(snapshot, batch) + finalize adds exactly one more hash
    aggregation over the unioned states; finalize itself is a zero-shuffle
    projection on top (no window, no sort, no Python)."""
    from doc_agent_spark.operators import incremental_agg as ia

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "value", (F.col("event_id") % 2).alias("b")
    )
    states = [
        ia.rollup_state(ev.filter(F.col("b") == i).drop("b"), ["event_type"], "value")
        for i in range(2)
    ]
    plan = _plan(ia.finalize(ia.merge_states(*states)))
    assert "Window" not in plan and "Sort" not in plan.replace("SortAggregate", "")
    assert "Python" not in plan and "Arrow" not in plan


def test_psi_histograms_broadcast_totals(spark, sf_dir):
    """PSI: each side reduces to B partial counts map-side; the totals
    row joins back as a broadcast (one row), never an exchange of the
    bucket frame; no Python."""
    from doc_agent_spark.operators import maintenance

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = maintenance.psi_drift(
        ev.filter(F.col("event_id") % 3 != 0),
        ev.filter(F.col("event_id") % 3 == 0),
        "value", n_buckets=16, lo=0.0, hi=500.0,
    )
    plan = _plan(out)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "Python" not in plan and "Arrow" not in plan


def test_zone_map_partial_agg_no_python(spark, sf_dir):
    """Zone maps are one hash aggregate sized by the file count: partial
    min/max/count combine map-side, one Exchange on file_id, no Python;
    prune_files adds only a projection."""
    from doc_agent_spark.operators import maintenance

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    zm = maintenance.zone_map(
        docs.select(F.floor(F.col("n_chars") / 64).cast("long").alias("file_id"), "n_chars"),
        "file_id", ["n_chars"],
    )
    plan = _plan(maintenance.prune_files(zm, "file_id", "n_chars", 150, 300))
    assert plan.count("Exchange") == 1
    assert "partial" in plan.lower()
    assert "Python" not in plan and "Arrow" not in plan


def test_outlink_extraction_stays_jvm_side(spark, sf_dir):
    """Outlink extraction + resolution + canonicalization is pure column
    algebra: no Python stage anywhere in the text_profile outlink arm's
    plan, and robots filtering is a broadcast join of per-host metadata."""
    from doc_agent_spark.functions import urls
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    links = (
        docs.select(
            F.concat(F.lit("https://h"), (F.col("doc_id") % 5).cast("string"),
                     F.lit(".com/a/p.html")).alias("url"),
            F.explode(urls.extract_hrefs(F.col("text"))).alias("ref"),
        )
        .select(urls.url_canonicalize(
            urls.resolve_url(F.col("url"), F.col("ref"))).alias("link"))
    )
    plan = _plan(links)
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


def test_robots_filter_is_broadcast_join_no_explode(spark):
    """The frontier side never explodes: one broadcast hash join against
    the per-host prefix arrays, blocked computed as an array exists."""
    from doc_agent_spark.operators import frontier
    from pyspark.sql import functions as F

    fr = spark.range(0, 1000).select(
        F.concat(F.lit("https://h"), (F.col("id") % 7).cast("string"),
                 F.lit(".com/p"), F.col("id").cast("string")).alias("url")
    )
    rules = frontier.parse_robots(spark.createDataFrame(
        [(f"h{i}.com", "User-agent: *\nDisallow: /private/\n") for i in range(7)],
        "host string, body string",
    ))
    plan = _plan(frontier.robots_filter(fr, rules))
    assert "BroadcastHashJoin" in plan
    assert "Generate" not in plan.split("BroadcastHashJoin")[0]  # frontier side unexploded
    assert "BatchEvalPython" not in plan


def test_schedule_frontier_single_host_window(spark):
    """Politeness scheduling is ONE window keyed on the host — no global
    (partition-less) window anywhere."""
    from doc_agent_spark.operators import frontier
    from pyspark.sql import functions as F

    fr = spark.range(0, 1000).select(
        F.concat(F.lit("https://h"), (F.col("id") % 7).cast("string"),
                 F.lit(".com/p"), F.col("id").cast("string")).alias("url"),
        (F.col("id") % 13).cast("double").alias("priority"),
    )
    plan = _plan(frontier.schedule_frontier(fr, "priority"))
    # partitioned Window prints three bracket groups (exprs, partition,
    # sort); a global window prints only two — every Window here must
    # carry a partition spec
    win_lines = [ln for ln in plan.split("\n") if "Window [" in ln]
    assert win_lines and all(ln.count("], [") == 2 for ln in win_lines)


def test_rag_answer_is_broadcast_shaped(spark, sf_dir):
    """The RAG composition stays k-row-bounded after retrieval: candidate
    hydration and snippet hydration are broadcast joins into the documents
    scan (the corpus never shuffles for them), fusion's top-n cuts plan as
    TakeOrderedAndProject, and no partition-less Window appears."""
    from doc_agent_spark.operators import search
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    terms = ["spark", "join"]
    kw = search.bm25_scores(docs, terms)
    vec = docs.select(F.col("doc_id").alias("id"),
                      (F.col("doc_id") % 97 / 97.0).alias("score"))
    df = search.rag_answer(docs, vec, kw, terms, k=3)
    plan = _plan(df)
    # the shared frames are localCheckpoint'ed (ExistingRDD scans in this
    # plan), so the TakeOrderedAndProject cut is asserted on the
    # pre-checkpoint fusion chain instead
    fused_plan = _plan(
        search.topk(
            search.rrf_fuse(vec, kw, top_n=100)
            .withColumnRenamed("rrf_score", "score"),
            6,
        )
    )
    assert "TakeOrderedAndProject" in fused_plan
    assert "BroadcastHashJoin" in plan
    win_lines = [ln for ln in plan.split("\n") if "Window [" in ln]
    assert all(ln.count("], [") == 2 for ln in win_lines)
    assert "CartesianProduct" not in plan


def test_eval_by_category_broadcasts_categories(spark):
    """The category map is eval-set-sized metadata: it must broadcast into
    the per-query metrics, never shuffle them."""
    from doc_agent_spark.operators import search
    from pyspark.sql import functions as F

    per_q = spark.range(0, 1000).select(
        F.col("id").alias("query_id"),
        (F.col("id") % 7 / 7.0).alias("recall_at_k"),
        (F.col("id") % 5 / 5.0).alias("precision_at_k"),
        (F.col("id") % 3 / 3.0).alias("mrr"),
    )
    cats = spark.range(0, 1000).select(
        F.col("id").alias("query_id"),
        F.concat(F.lit("cat"), (F.col("id") % 4).cast("string")).alias("category"),
    )
    plan = _plan(search.eval_retrieval_by_category(per_q, cats))
    assert "BroadcastHashJoin" in plan


def test_bm25_multi_broadcasts_terms_single_corpus_pass(spark, sf_dir):
    """The batched eval engine's scale shape: the query-term table
    broadcasts into the corpus token stream (never shuffles it), the
    per-(id, term) tf is a partial-aggregated hash aggregate, and the
    whole plan carries no window and no cartesian product."""
    from doc_agent_spark.operators import search
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    queries = spark.createDataFrame(
        [(i, ["spark", "join", "window"]) for i in range(50)],
        "query_id long, terms array<string>",
    )
    df = search.bm25_scores_multi(docs, queries)
    df.collect()   # AQE finalizes the plan (exchange reuse appears then)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "partial_count" in plan          # map-side combine on the tf agg
    assert "CartesianProduct" not in plan
    assert "Window [" not in plan
    # the (id, term) tf exchange feeds BOTH df and scoring: AQE must reuse
    # it, so the corpus tokenize+explode runs once regardless of |Q|
    assert "ReusedExchange" in plan
