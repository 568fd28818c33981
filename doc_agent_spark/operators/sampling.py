"""Deterministic sampling for training-data curation.

Spark's ``df.sample`` is seed-dependent on partitioning (a repartition or
cluster-size change reshuffles which rows a seed selects) — useless when a
sample must be reproducible across runs and cluster sizes, or mirrored by
an external oracle. These samplers decide per ROW from a content hash, so
the same row is always in or out regardless of physical layout:

    keep(row)  ⇔  substr(md5(seed:key), 1, 8) < hex(fraction · 16^8)

The comparison is LEXICOGRAPHIC over lowercase hex, which orders exactly
like the underlying 32-bit number — no numeric conversion, so Spark and
the DuckDB oracle agree byte-for-byte. Everything is a zero-shuffle filter
projection; at 100 TB the sample is a pushdown-friendly scan filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ALWAYS = "g"          # every 8-char hex string sorts below 'g'
_NEVER = "00000000"    # no 8-char hex string sorts strictly below this


def hex_threshold(fraction: float) -> str:
    """8-hex-char cutoff such that P[md5-prefix < cutoff] = fraction."""
    if fraction >= 1.0:
        return _ALWAYS
    if fraction <= 0.0:
        return _NEVER
    return format(int(fraction * 16 ** 8), "08x")


def _hash8(key: Column, seed: str) -> Column:
    return F.substring(
        F.md5(F.concat(F.lit(f"{seed}:"), key.cast("string"))), 1, 8
    )


def sample_bernoulli(
    df: DataFrame, fraction: float, key_col: str, seed: str = "s42"
) -> DataFrame:
    """Uniform deterministic sample: a row is kept iff its hash prefix
    falls below the fraction cutoff. Stable under repartitioning, cluster
    size, and re-runs."""
    return df.filter(_hash8(F.col(key_col), seed) < F.lit(hex_threshold(fraction)))


def sample_stratified(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str,
    key_col: str,
    seed: str = "s42",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the training-data mixer: e.g.
    keep 100% of high-quality docs and 10% of boilerplate-heavy ones. The
    per-stratum cutoff map folds into a CASE expression (model-sized,
    never shuffled); unlisted strata get ``default_fraction``."""
    thr = F.lit(hex_threshold(default_fraction))
    for value, frac in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == value, F.lit(hex_threshold(frac))).otherwise(thr)
    return df.filter(_hash8(F.col(key_col), seed) < thr)


def sample_weighted(
    df: DataFrame, weight: Column, key_col: str, seed: str = "s42"
) -> DataFrame:
    """Keep each row with probability = its weight column (clamped to
    [0,1]) — probability-proportional curation (e.g. keep-rate = quality
    score). Deterministic like the other samplers: the row's hash-uniform
    is compared against the hex-encoded weight threshold, so re-runs and
    cluster-size changes keep the identical sample. The weight→threshold
    encoding is a pure expression (lpad(hex(weight·16^8))), no UDF."""
    w = F.least(F.greatest(weight.cast("double"), F.lit(0.0)), F.lit(1.0))
    thr = F.when(w >= 1.0, F.lit(_ALWAYS)).otherwise(
        F.lpad(F.lower(F.hex(F.floor(w * F.lit(float(16 ** 8))).cast("long"))), 8, "0")
    )
    return df.filter(_hash8(F.col(key_col), seed) < thr)


def split_assign(
    df: DataFrame,
    splits: dict[str, float],
    key_col: str,
    seed: str = "split42",
) -> DataFrame:
    """Deterministic train/val/test assignment: adds a ``split`` column by
    cutting the content-hash uniform into cumulative fraction bands (e.g.
    ``{"train": 0.9, "val": 0.05, "test": 0.05}`` ⇒ hash < 0.9 → train,
    < 0.95 → val, else test). Every row gets exactly one split, the
    assignment never changes under repartitioning/cluster size/re-runs,
    and — critically for leakage — a given document key lands in the same
    split in every pipeline that uses the same seed. Fractions must sum to
    ~1.0 (the last band absorbs float slack). Zero-shuffle projection."""
    total = sum(splits.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split fractions must sum to 1.0, got {total}")
    if any(f < 0 for f in splits.values()):
        # a negative band would make a later split silently unreachable
        raise ValueError(f"split fractions must be non-negative: {splits}")
    h = _hash8(F.col(key_col), seed)
    names = list(splits)
    expr = F.lit(names[-1])  # last band absorbs rounding slack
    cum_fracs = []
    acc = 0.0
    for name in names[:-1]:
        acc += splits[name]
        cum_fracs.append((name, hex_threshold(acc)))
    for name, thr in reversed(cum_fracs):  # earliest band wins ties
        expr = F.when(h < F.lit(thr), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def split_assign_sql(
    splits: dict[str, float], key_expr: str, seed: str = "split42"
) -> str:
    """DuckDB mirror of :func:`split_assign`'s ``split`` expression."""
    h = hash8_sql(key_expr, seed)
    names = list(splits)
    acc = 0.0
    whens = []
    for name in names[:-1]:
        acc += splits[name]
        whens.append(f"WHEN {h} < '{hex_threshold(acc)}' THEN '{name}'")
    return f"CASE {' '.join(whens)} ELSE '{names[-1]}' END"


def mixture_rates(
    df: DataFrame,
    targets: dict[str, float],
    domain_col: str,
    weight: Column | None = None,
) -> dict[str, float]:
    """Per-domain keep rates that move the corpus toward a target mixture
    (static domain reweighting by downsampling): rate_d ∝ target_d /
    observed_share_d, scaled so the largest rate is 1.0 (the most
    underrepresented domain is kept in full; nothing is upsampled —
    duplication is the dedup stage's enemy). ``weight`` is the mass column
    (token count for token-level mixtures; None = document count).

    One tiny aggregate (n_domains rows) collected to the driver — the
    model-sized exception to no-collect; the returned dict folds into
    :func:`sample_stratified`'s CASE expression, so the actual resample is
    a zero-shuffle deterministic filter. Domains absent from ``targets``
    get rate 0 (dropped)."""
    if not targets:
        raise ValueError("targets must be non-empty")
    bad = [d for d, t in targets.items() if t < 0]
    if bad or abs(sum(targets.values()) - 1.0) > 1e-6:
        raise ValueError(f"targets must be non-negative and sum to 1.0: {targets}")
    mass = (weight if weight is not None else F.lit(1)).alias("_m")
    obs = {
        r[0]: r[1]
        for r in df.select(F.col(domain_col), mass)
        .groupBy(domain_col)
        .agg(F.sum("_m").alias("m"))
        .collect()
    }
    total = sum(obs.get(d, 0) for d in targets)
    if total == 0:
        raise ValueError("no corpus mass in any target domain")
    raw = {
        d: (t / (obs[d] / total)) if obs.get(d) else 0.0
        for d, t in targets.items()
    }
    peak = max(raw.values())
    if peak == 0:
        raise ValueError("all target domains are empty in the corpus")
    return {d: r / peak for d, r in raw.items()}


def resample_to_mixture(
    df: DataFrame,
    targets: dict[str, float],
    domain_col: str,
    key_col: str,
    weight: Column | None = None,
    seed: str = "mix42",
) -> DataFrame:
    """Deterministically downsample each domain so the kept corpus
    approximates ``targets`` (exact in expectation; per-row decisions are
    content-hash stable across runs and cluster sizes). Composition of
    :func:`mixture_rates` + :func:`sample_stratified`."""
    rates = mixture_rates(df, targets, domain_col, weight=weight)
    return sample_stratified(
        df, fractions=rates, strata_col=domain_col, key_col=key_col, seed=seed
    )


def hash8_sql(key_expr: str, seed: str = "s42") -> str:
    """DuckDB mirror of the hash prefix (md5 hex is engine-identical)."""
    return f"substr(md5('{seed}:' || CAST({key_expr} AS VARCHAR)), 1, 8)"


def weighted_threshold_sql(weight_expr: str) -> str:
    """DuckDB mirror of the weight→hex-threshold encoding."""
    w = f"least(greatest(CAST({weight_expr} AS DOUBLE), 0.0), 1.0)"
    return (
        f"CASE WHEN {w} >= 1.0 THEN '{_ALWAYS}' "
        f"ELSE lpad(lower(hex(CAST(floor({w} * {float(16 ** 8)!r}) AS BIGINT))), 8, '0') END"
    )


def cap_per_domain(
    df: DataFrame, cap: int, domain_col: str, key_col: str, seed: str = "cap42",
    broadcast_over: bool = True,
) -> DataFrame:
    """Hard per-domain quota (the RefinedWeb/C4 anti-monoculture cap): keep
    at most ``cap`` rows per domain, chosen deterministically as the rows
    with the ``cap`` smallest content-hash prefixes (ties broken by key) —
    a different primitive from rate-based sampling: the cap binds however
    large the domain grows, so one crawl-happy host can't dominate the
    training mixture.

    100 TB shape: a naive ``row_number() OVER (PARTITION BY domain)``
    sorts EVERY domain — and the whole point of the cap is that domain
    mass is Zipfian, so the head domain's partition is the skew cliff.
    This splits on a per-domain count first: under-cap domains (the long
    tail, most of the corpus) pass through with an equi-join against the
    small over-cap domain list (broadcast when it fits) and never enter a
    window; only over-cap domains shuffle into the rank, and their output
    is bounded at cap rows each. Equivalent to the global window by
    construction (an under-cap domain's rows all rank <= cap), which is
    exactly the form the DuckDB oracle runs (cap_per_domain_sql)."""
    from pyspark.sql import Window

    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    over = (
        df.groupBy(domain_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > cap)
        .select(F.col(domain_col).alias("_od"))
    )
    if broadcast_over:
        # the over-cap list is usually model-sized; callers with extreme
        # (cap, domain-cardinality) configs where millions of domains
        # exceed the cap pass broadcast_over=False and let AQE plan it
        over = F.broadcast(over)
    # NULL-SAFE routing (eqNullSafe, not an equi-join on the column name):
    # plain equi-joins never match NULL keys, so every NULL-domain row
    # would bypass the cap entirely — while the window below (and the
    # DuckDB oracle) group NULLs as ONE capped partition
    cond = F.col(domain_col).eqNullSafe(F.col("_od"))
    under_rows = df.join(over, cond, "left_anti")
    w = Window.partitionBy(domain_col).orderBy(
        _hash8(F.col(key_col), seed), F.col(key_col)
    )
    over_rows = (
        df.join(over, cond, "left_semi")
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= cap)
        .drop("_r")
    )
    return under_rows.unionByName(over_rows).select(*df.columns)


def cap_per_domain_sql(
    table: str, cap: int, domain_expr: str, key_expr: str, seed: str = "cap42"
) -> str:
    """DuckDB mirror: the plain global-window form the split-path Spark
    plan is provably equivalent to."""
    h = hash8_sql(key_expr, seed)
    return f"""
SELECT * EXCLUDE (_r) FROM (
  SELECT *, row_number() OVER (
    PARTITION BY {domain_expr} ORDER BY {h}, {key_expr}) AS _r
  FROM {table})
WHERE _r <= {cap}
""".strip()


def leak_safe_split(
    ids: DataFrame,
    clusters: DataFrame,
    splits: dict[str, float],
    seed: str = "split42",
) -> DataFrame:
    """Contamination-safe train/val/test assignment: every member of a
    near-dup cluster gets the SAME split, so a validation document can
    never have a near-duplicate sitting in train (the leakage a plain
    per-doc hash split ignores — doc-level splitting leaks whenever
    dedup was fuzzy, Lee et al. 2021 §6.2).

    ``ids`` is (id); ``clusters`` is the (id, cluster_id) output of
    :func:`~doc_agent_spark.operators.dedup.dup_clusters` (or the star
    variant) covering only clustered docs. The split key is
    coalesce(cluster_id, id): unclustered docs hash on their own id (the
    split distribution is unchanged for the non-dup mass), cluster
    members hash on the min-label representative. One broadcast-or-shuffle
    left join + the zero-shuffle split projection; output
    ``(id, group_key, split)``."""
    eff = ids.join(clusters, "id", "left").select(
        "id", F.coalesce(F.col("cluster_id"), F.col("id")).alias("group_key")
    )
    return split_assign(eff, splits, "group_key", seed)


def token_budget_cap(
    df: DataFrame,
    budget: int,
    lang_col: str,
    key_col: str,
    weight_col: str,
    seed: str = "unimax42",
    broadcast_over: bool = True,
) -> DataFrame:
    """UniMax-style per-language token budget (Chung et al. 2023,
    arXiv:2304.09151): keep each language's hash-smallest documents until
    the language has contributed ``budget`` tokens — the byte-budget
    analog of :func:`cap_per_domain`'s doc-count quota, and the fairness
    primitive for multilingual mixtures (head languages truncate at the
    budget, tail languages pass through whole instead of being starved by
    proportional sampling).

    Keep rule (pinned, mirrored by :func:`token_budget_cap_sql`): a doc is
    kept iff the cumulative weight of strictly-earlier docs in its
    language's (hash, key) order is < ``budget`` — so every language keeps
    at least one doc, and the kept mass overshoots by at most one doc (the
    standard prefix-budget convention; an inclusive rule could keep zero
    docs from a language whose first doc alone exceeds the budget).

    100 TB shape, same split as :func:`cap_per_domain`: a per-language
    mass aggregate first; under-budget languages (the long tail) bypass
    via a broadcast anti-join and never enter a window; only over-budget
    languages shuffle into the cumsum, and their KEPT mass is bounded at
    ~budget each. The window still sorts the head language's full input —
    at extreme scale, pre-filter to the hash-smallest ≈(budget/mass)·(1+ε)
    fraction with :func:`sample_stratified` first and run the exact cumsum
    on the survivor set; the one-phase form here is the exact reference
    semantics the oracle mirrors."""
    from pyspark.sql import Window

    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    over = (
        df.groupBy(lang_col)
        .agg(F.sum(weight_col).alias("_m"))
        .filter(F.col("_m") > budget)
        .select(F.col(lang_col).alias("_ol"))
    )
    if broadcast_over:
        over = F.broadcast(over)
    # null-safe routing: see cap_per_domain — a NULL lang must hit the
    # window branch like the oracle's NULL partition, not bypass the budget
    cond = F.col(lang_col).eqNullSafe(F.col("_ol"))
    under_rows = df.join(over, cond, "left_anti")
    # explicit ROWS frame: the default RANGE frame includes order-key
    # PEERS (two rows sharing key_col), so each twin's prefix sum would
    # include the other's weight — diverging from the strictly-earlier
    # rule and the oracle's ROWS UNBOUNDED PRECEDING
    w = (
        Window.partitionBy(lang_col)
        .orderBy(_hash8(F.col(key_col), seed), F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    over_rows = (
        df.join(over, cond, "left_semi")
        .withColumn(
            "_cum_before",
            F.sum(weight_col).over(w) - F.col(weight_col),
        )
        .filter(F.col("_cum_before") < budget)
        .drop("_cum_before")
    )
    return under_rows.unionByName(over_rows).select(*df.columns)


def token_budget_cap_sql(
    table: str,
    budget: int,
    lang_expr: str,
    key_expr: str,
    weight_expr: str,
    seed: str = "unimax42",
) -> str:
    """DuckDB mirror: the plain global-window form the split-path Spark
    plan is provably equivalent to (an under-budget language's every doc
    has prefix mass < budget)."""
    h = hash8_sql(key_expr, seed)
    return f"""
SELECT * EXCLUDE (_cb) FROM (
  SELECT *, sum({weight_expr}) OVER (
      PARTITION BY {lang_expr} ORDER BY {h}, {key_expr}
      ROWS UNBOUNDED PRECEDING) - {weight_expr} AS _cb
  FROM {table})
WHERE _cb < {budget}
""".strip()
