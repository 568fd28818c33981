"""Temporal joins Spark's relational API lacks as primitives — built as
compositions of existing operators with scale-correct shapes (task brief:
as-of join / range join as custom-operator examples).

- As-of join: union + partitioned window with ignore-nulls last_value —
  ONE shuffle on (key), no inequality join at all. This is the classic
  scalable formulation: an inequality theta-join would be a
  nested-loop/cartesian fallback; the union-window form is linear and
  AQE-skew-splittable on the key.
- Range join: bin expansion — each interval explodes to the fixed-width
  bins it overlaps, points map to their bin, and the join becomes an
  EQUI-join on bin plus an exact residual filter. Candidate volume is
  |points| + Σ interval_width/bin_width, never |points|·|intervals|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    right_value_cols: tuple[str, ...] = ("value",),
) -> DataFrame:
    """For every left row, attach the LATEST right row with
    right.ts <= left.ts for the same key (DuckDB/kdb ASOF LEFT JOIN
    semantics; unmatched lefts keep nulls).

    Right rows must be unique per (key, ts) — pre-aggregate if not; at
    equal timestamps the right row is visible to the left row (>=, not >),
    ordered by a side marker within the window.
    """
    rstruct = F.struct(
        F.col(ts_col).alias("r_ts"), *[F.col(c).alias(f"r_{c}") for c in right_value_cols]
    )
    r = right.select(
        F.col(key_col), F.col(ts_col), F.lit(0).alias("_side"), rstruct.alias("_rv")
    )
    l = left.select(
        "*", F.lit(1).alias("_side"), F.lit(None).cast(r.schema["_rv"].dataType).alias("_rv")
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    # right (_side=0) sorts before left at equal ts ⇒ same-instant rights
    # are visible; one shuffle on the key, linear scan per key
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn("_m", F.last("_rv", ignorenulls=True).over(w))
    return (
        matched.filter(F.col("_side") == 1)
        .drop("_side", "_rv")
        .select(
            *[c for c in left.columns],
            F.col("_m.r_ts").alias("matched_ts"),
            *[F.col(f"_m.r_{c}").alias(f"matched_{c}") for c in right_value_cols],
        )
    )


def scd2_intervals(
    updates: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_cols: tuple[str, ...] = ("value",),
    dedupe_unchanged: bool = True,
) -> DataFrame:
    """Slowly-changing-dimension type-2 history from an update stream:
    one row per (key, version) carrying ``valid_from``/``valid_to``
    (NULL valid_to = the current version) and a per-key version number.
    With ``dedupe_unchanged`` consecutive updates whose tracked values are
    identical collapse into one interval (change-only compression — the
    null-safe comparison matches SQL's IS DISTINCT FROM).

    Scale shape: ONE shuffle on the key; both window passes (change
    detection, lead/version) share the same partitioning+ordering so the
    exchange is reused, and every window is bounded by one key's update
    count. Updates must be unique per (key, ts) — pre-aggregate if not.
    The point-in-time FACT join against the result should go through
    ``asof_join`` on valid_from (union+window, no inequality theta-join);
    interval-containment joins against arbitrary interval sets go through
    ``range_join_binned``.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col)
    df = updates
    if dedupe_unchanged:
        df = df.select(
            "*",
            F.lag(ts_col).over(w).alias("_pts"),
            *[F.lag(c).over(w).alias(f"_p_{c}") for c in value_cols],
        )
        changed = F.col("_pts").isNull()
        for c in value_cols:
            changed = changed | ~F.col(c).eqNullSafe(F.col(f"_p_{c}"))
        df = df.filter(changed).drop("_pts", *[f"_p_{c}" for c in value_cols])
    return (
        df.select(key_col, F.col(ts_col).alias("valid_from"), *value_cols)
        .withColumn(
            "valid_to",
            F.lead("valid_from").over(Window.partitionBy(key_col).orderBy("valid_from")),
        )
        .withColumn(
            "version",
            F.row_number().over(Window.partitionBy(key_col).orderBy("valid_from")),
        )
    )


def scd2_snapshot(history: DataFrame, at_ts) -> DataFrame:
    """Point-in-time dimension snapshot: the version governing ``at_ts``
    per key — a zero-join filter over the history table (the reason SCD2
    beats re-materializing the dimension per day at 100 TB)."""
    return history.filter(
        (F.col("valid_from") <= at_ts)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > at_ts))
    )


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bin_seconds: int = 3600,
) -> DataFrame:
    """Inner-join each point to every interval containing it
    (start <= ts <= end, inclusive) WITHOUT an inequality join.

    Both sides map to fixed ``bin_seconds`` bins (intervals explode to the
    bins they overlap); the bin equi-join prunes candidates to
    same-bin pairs and the exact containment filter finishes. Pick
    bin_seconds near the median interval width: wider bins fan points out
    less but admit more false candidates per bin.
    """
    bin_of = lambda c: F.floor(F.unix_timestamp(c) / F.lit(bin_seconds))  # noqa: E731
    p = points.withColumn("_bin", bin_of(F.col(ts_col)))
    iv = intervals.withColumn(
        "_bin",
        F.explode(F.sequence(bin_of(F.col(start_col)), bin_of(F.col(end_col)))),
    )
    return (
        p.join(iv, "_bin")
        .filter((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col)))
        .drop("_bin")
    )
