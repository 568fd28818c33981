"""Incremental rollup maintenance: merge a batch's partial aggregates into
a persisted rollup snapshot without re-scanning history.

The 100 TB operational story: a 10^12-row events table gets a daily batch
of ~10^9 rows. Recomputing `events_hourly` from scratch re-scans three
years of history for a one-day change. The mergeable-state pattern keeps
the rollup as per-key PARTIAL state (count / fixed-point sum / min / max —
every column closed under per-key merge), so snapshot N+1 = merge(snapshot
N, state(batch)): cost scales with the batch and the key cardinality,
never with history. It is the same algebra Spark's own partial aggregation
uses map-side (ObjectHashAggregate partial → final) lifted to a PERSISTED
table boundary, and the batch analog of what a Structured Streaming
aggregation keeps in its state store.

Design constraints that make the state a real table contract:

- **Exact mergeability.** Double addition is not associative, so a sum
  carried as double would drift as the merge tree reshapes across
  snapshots. The state instead carries ``sum_micros``: per-row fixed-point
  ``CAST(round(value * 10^scale) AS BIGINT)`` summed as longs — bit-exact
  under any merge order, any cluster size, any snapshot cadence, and
  reproducible by the DuckDB oracle. (Same fixed-point discipline as the
  publish manifest's decimal checksum and tfidf's micro-unit scores.)
- **Self-describing keys.** State schema = key columns + (n, sum_micros,
  min_v, max_v); `merge_states` groups by everything that is not a state
  column, so caller key sets of any width merge without re-declaration.
- **Finalize is a projection.** Deriving the serving columns (n_events,
  sum_value, avg_value, …) never touches history either — it is a
  zero-shuffle map over the merged state.

Reference anchor: the metrics-table fold the reference keeps per run
(packages/extract/src/extract.ts:20-33 accumulates docs/spans/failures
per process) — here generalized to the snapshot+delta rollup a pipeline
maintains across runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATE_COLS = ("n", "sum_micros", "min_v", "max_v")


def rollup_state(
    df: DataFrame, keys: list[str], value_col: str, scale: int = 6
) -> DataFrame:
    """Per-key mergeable partial state over ``value_col``.

    One hash aggregation (map-side partial + final); the fixed-point cast
    happens in the scan projection so the state is exact from the first
    partial on. ``n`` counts ROWS (count(*)), so with null values present
    avg_value = sum(non-null)/rows — pre-filter nulls if you want a
    mean-of-values. ``scale`` decimal digits are preserved; values must fit
    ``sum(|v|) * 10^scale < 2^63`` (10^12 rows × 10^6-scaled values needs
    a shard-then-merge cadence well before the long overflows — merge
    cadence is the caller's contract; finalize raises past 2^53, where
    the serving projection's double conversion would go inexact first).
    """
    micros = F.round(F.col(value_col) * F.lit(10 ** scale)).cast("long")
    return df.groupBy(*keys).agg(
        F.count("*").alias("n"),
        F.sum(micros).alias("sum_micros"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
    )


def merge_states(*states: DataFrame) -> DataFrame:
    """snapshot N+1 = merge(snapshot N, batch state, ...).

    Union of same-schema states, one hash aggregation on the key columns
    (everything that is not a state column). Exact under any merge order:
    n and sum_micros add as longs, min/max are idempotent lattice ops.
    """
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    keys = [c for c in merged.columns if c not in STATE_COLS]
    return merged.groupBy(*keys).agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("sum_micros").cast("long").alias("sum_micros"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )


def finalize(state: DataFrame, scale: int = 6, round_to: int = 4) -> DataFrame:
    """Serving projection over the merged state — zero shuffle.

    sum/avg rescale from the fixed-point state; both are exact to
    ``scale`` digits, then rounded to ``round_to`` for the serving table.
    A key whose |sum_micros| exceeds 2^53 raises here rather than serving
    silently-inexact values: the long state itself is still exact well
    beyond that, but the double conversion in this projection is not —
    hitting the guard means the caller's scale/merge-cadence contract
    needs a smaller scale or per-shard keys, not a quiet rounding loss.
    """
    keys = [c for c in state.columns if c not in STATE_COLS]
    denom = float(10 ** scale)
    exact = F.when(
        # NULL sum_micros (a key whose values were all NULL) passes through
        # as NULL serving sums — only a real value past 2^53 raises
        F.col("sum_micros").isNull()
        | (F.abs(F.col("sum_micros")) <= F.lit(2 ** 53)),
        F.col("sum_micros"),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("incremental_agg.finalize: |sum_micros|="),
                F.abs(F.col("sum_micros")).cast("string"),
                F.lit(" exceeds 2^53 — exact double conversion lost; "
                      "reduce scale or shard the key"),
            )
        )
    )
    return state.select(
        *keys,
        F.col("n").alias("n_events"),
        F.round(exact / denom, round_to).alias("sum_value"),
        F.round(exact / denom / F.col("n"), round_to).alias("avg_value"),
        F.col("min_v").alias("min_value"),
        F.col("max_v").alias("max_value"),
    )


def rollup_state_sql(table: str, keys: list[str], value_expr: str,
                     scale: int = 6) -> str:
    """DuckDB mirror of ``rollup_state`` (a SELECT; compose in a WITH)."""
    ks = ", ".join(keys)
    return f"""
SELECT {ks}, count(*) AS n,
       CAST(sum(CAST(round({value_expr} * 1e{scale}) AS BIGINT)) AS BIGINT) AS sum_micros,
       min({value_expr}) AS min_v, max({value_expr}) AS max_v
FROM {table} GROUP BY {ks}
"""


def merge_finalize_sql(states_sql: list[str], keys: list[str],
                       scale: int = 6, round_to: int = 4) -> str:
    """DuckDB mirror of ``merge_states`` + ``finalize`` over state SELECTs."""
    ks = ", ".join(keys)
    union = " UNION ALL ".join(f"SELECT * FROM ({s})" for s in states_sql)
    # same 2^53 exactness guard as finalize (DuckDB error()), same
    # NULL-passes-through semantics — the engines diverge nowhere
    exact = (
        "CASE WHEN sum(sum_micros) IS NULL"
        f" OR abs(sum(sum_micros)) <= {2 ** 53} THEN sum(sum_micros)"
        " ELSE CAST(error('incremental_agg: sum_micros exceeds 2^53') AS BIGINT)"
        " END"
    )
    return f"""
SELECT {ks}, CAST(sum(n) AS BIGINT) AS n_events,
       round({exact} / 1e{scale}, {round_to}) AS sum_value,
       round({exact} / 1e{scale} / sum(n), {round_to}) AS avg_value,
       min(min_v) AS min_value, max(max_v) AS max_value
FROM ({union}) GROUP BY {ks}
"""
