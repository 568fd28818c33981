"""Skew handling for media-heavy documents (north_rule; SURVEY §4.2.1).

AQE's skew-join splitting only helps JOIN stages; our skew is per-row
compute cost inside the extraction UDF (a doc with 200 media spans costs
200× a 1-span doc). Two levers:

- ``spread_by_doc``: salted repartition — distributes rows uniformly by
  ``hash(doc_id, salt)`` so heavy docs land on different partitions even
  when the input file layout clusters them. One shuffle, paid only when
  requested (the default narrow plan has zero shuffles).

- ``split_heavy``: span-level decomposition — docs with more than
  ``max_spans`` spans are exploded so the (cheap) per-span text prep is
  distributed, then re-grouped with sort_array(collect_list(...)) — order
  restored from DATA (offset), never partition order. Use when single docs
  exceed what one task should hold; costs a shuffle for the heavy slice
  only (the light slice stays narrow and is unioned back).

Measured tradeoff (bench.py skew phase, BASELINE.md): on a corpus whose
heavy docs are clustered in one input file, spread_by_doc is 6.8× faster
than the naive plan (42.7 s → 6.3 s) while split_heavy is slightly SLOWER
than naive (two shuffles + regroup). Reach for split_heavy only when
individual documents are large enough to dominate a single task — doc-level
salting cannot split within one doc; span-level decomposition can.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spread_by_doc(df: DataFrame, num_partitions: int | None = None, salt: int = 16) -> DataFrame:
    """Salted uniform spread: repartition on pmod(hash(doc_id, salt_rand), P).

    The salt term decorrelates the distribution from any downstream
    hash-partitioning on doc_id, so two consecutive spreads don't collide.
    """
    # NOTE: the key is the raw (high-cardinality) hash, NOT pre-pmod'd into
    # [0, P): repartition(P, key) hashes the key expression AGAIN mod P, so
    # a key collapsed to P distinct values first would throw P groups into
    # P bins — a balls-into-bins occupancy with ~1/e of partitions empty
    # and others holding 2-3 groups. The raw hash keeps per-row cardinality
    # and the second hash spreads it smoothly.
    key = F.hash(F.col("doc_id"), F.lit(salt))
    if num_partitions:
        return df.repartition(num_partitions, key)
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism, key)


def split_heavy(df: DataFrame, max_spans: int = 32, num_partitions: int | None = None) -> DataFrame:
    """Route heavy docs through explode → spread → regroup; light docs pass
    through untouched. Output schema == input schema (doc_id, spans);
    span order inside the array is restored by offset sort downstream
    (spec sorts defensively as well)."""
    # size(NULL) is NULL (legacy.sizeOfNull=false since Spark 3), so a
    # null-spans doc would fail BOTH filters and silently vanish — coalesce
    # routes it through the light (untouched) branch, preserving rows.
    n_spans = F.coalesce(F.size("spans"), F.lit(0))
    heavy = df.filter(n_spans > max_spans)
    light = df.filter(n_spans <= max_spans)
    exploded = heavy.select("doc_id", F.explode("spans").alias("span"))
    spread = spread_by_doc(exploded, num_partitions)
    regrouped = spread.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list("span"),
            lambda a, b: F.when(a.offset < b.offset, F.lit(-1))
            .when(a.offset > b.offset, F.lit(1))
            .otherwise(F.lit(0)),
        ).alias("spans")
    )
    return light.unionByName(regrouped)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    row_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skewed-key equi-join: salt the BIG side, replicate the SMALL side.

    When one join key carries a disproportionate share of the big side
    (the Zipfian-head host/domain/doc problem), a plain shuffle join sends
    every hot-key row to ONE reducer. AQE's skew-join split handles this
    only for sort-merge joins it can re-plan; this helper is the explicit
    form for when the skew is known and you want it partitioned away
    deterministically: the big side gets ``_salt = hash(row_key) % n``
    (content-derived, so re-runs and cluster sizes salt identically — the
    sampling module's determinism discipline), the small side is exploded
    ×n_salts, and the join runs on (keys…, _salt) — the hot key now spreads
    over n reducers at the cost of replicating the small side n×.

    Semantics equal the plain join for inner/left: each big row sees
    exactly the one replica of its matching small rows that carries its
    salt. Not for right/full joins (an unmatched small row would surface
    n times)."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    bs = big.withColumn(
        "_salt", F.pmod(F.hash(F.col(row_key), F.lit(11)), F.lit(n_salts))
    )
    ss = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return bs.join(ss, [*on, "_salt"], how).drop("_salt")


def heavy_keys(
    big: DataFrame,
    key_col: str,
    row_key: str,
    threshold_share: float = 0.005,
    sample_fraction: float = 0.05,
    seed: str = "hk",
) -> list:
    """Deterministic heavy-hitter detection for join salting: which join
    keys carry more than ``threshold_share`` of the big side's rows?

    Counts run over a content-hash Bernoulli row sample (the sampling
    module's determinism discipline — same keys at any cluster size or
    layout, no RNG state), so the scan reads only (key, row-hash) and the
    aggregate shuffles only the sampled slice. A key whose true share is s
    appears in the sample with share ≈ s (binomial concentration), so at
    the scales where salting matters (share ≥ ~0.5 % of 10^12 rows, i.e.
    ≥ 10^9 sampled-from rows per hot key) the detected set is stable.
    The returned list is driver-sized by construction: at most
    1/threshold_share keys can exceed the share bound."""
    from doc_agent_spark.operators import sampling

    s = sampling.sample_bernoulli(
        big.select(key_col, row_key), sample_fraction, key_col=row_key, seed=seed
    )
    # null keys never match an equi-join — they cannot be "hot" for it
    counts = s.filter(F.col(key_col).isNotNull()).groupBy(key_col).agg(
        F.count("*").alias("_n")
    )
    total = s.count()
    if total == 0:
        return []
    # The cut must come from the SHARE, not a floor: int(total*share)
    # floors to 0 when total*share < 1 (every sampled key "hot" at cut=1),
    # and any fixed small floor still certifies binomial flukes. When the
    # sample cannot place at least 2 expected rows on a threshold-share key
    # it cannot certify ANY key hot — return none (callers fall back to the
    # plain join or an explicit hot list). The limit makes the docstring's
    # driver-size bound unconditional: at most 1/threshold_share keys
    # (ordered by count desc, key asc for determinism).
    import math

    if total * threshold_share < 2:
        return []
    cut = math.ceil(total * threshold_share)
    return [
        r[0]
        for r in counts.filter(F.col("_n") >= cut)
        .orderBy(F.desc("_n"), F.asc(key_col))
        .limit(int(1 / threshold_share))
        .collect()
    ]


def skewed_split_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    row_key: str,
    hot_keys: list | None = None,
    n_salts: int = 8,
    how: str = "inner",
    threshold_share: float = 0.005,
    sample_fraction: float = 0.05,
) -> DataFrame:
    """Hybrid skew join: hot keys take the salted path, the cold tail takes
    the plain equi-join — the replication cost of :func:`salted_join` is
    paid ONLY for the (tiny) hot-key slice of the small side.

    ``salted_join`` replicates the ENTIRE small side ×n_salts; fine when
    the small side is dimension-sized, wasteful when it is merely
    "smaller" (e.g. a 10^9-row doc-stats table joined to 10^12 events
    skewed on a handful of mega-hosts). Splitting on the detected hot-key
    list (``heavy_keys`` when not given) keeps the cold join's shuffle
    byte-identical to the naive plan while the hot slice — a broadcastable
    key list by construction — fans out over n_salts reducers.

    Semantics equal the plain join for inner/left: the key space is
    partitioned between the two branches (null keys ride the cold branch,
    preserving left-join null-key rows), each branch is join-correct, and
    the union is disjoint. Same inner/left restriction as salted_join."""
    if len(on) != 1:
        raise ValueError("skewed_split_join detects skew on single-column keys")
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"skewed_split_join supports inner/left joins, got {how!r}")
    key = on[0]
    if hot_keys is None:
        hot_keys = heavy_keys(
            big, key, row_key,
            threshold_share=threshold_share, sample_fraction=sample_fraction,
        )
    if not hot_keys:
        return big.join(small, on, how)
    is_hot = F.col(key).isin(hot_keys)
    hot = salted_join(
        big.filter(is_hot), small.filter(is_hot), on, row_key, n_salts, how
    )
    cold = big.filter(~is_hot | F.col(key).isNull()).join(
        small.filter(~is_hot), on, how
    )
    return hot.unionByName(cold)
