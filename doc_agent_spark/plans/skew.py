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
    key = F.pmod(
        F.hash(F.col("doc_id"), F.lit(salt)), F.lit(num_partitions or df.sparkSession.sparkContext.defaultParallelism)
    )
    if num_partitions:
        return df.repartition(num_partitions, key)
    return df.repartition(key)


def split_heavy(df: DataFrame, max_spans: int = 32, num_partitions: int | None = None) -> DataFrame:
    """Route heavy docs through explode → spread → regroup; light docs pass
    through untouched. Output schema == input schema (doc_id, spans);
    span order inside the array is restored by offset sort downstream
    (spec sorts defensively as well)."""
    heavy = df.filter(F.size("spans") > max_spans)
    light = df.filter(F.size("spans") <= max_spans)
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
