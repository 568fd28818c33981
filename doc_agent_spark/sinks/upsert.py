"""S7 — document upsert sink (idempotent MERGE on path_hash).

Reference: packages/storage/src/index.ts:29-54 — insert; on path_hash
conflict update {id, data, status:'pending'} (status reset so the doc is
re-indexed), created_at preserved from the first insert
(repository.test.ts:39-60: two saves to one path → ONE row, latest data).

Production sink is Iceberg:

    MERGE INTO target t USING updates u ON t.path_hash = u.path_hash
    WHEN MATCHED THEN UPDATE SET t.id = u.id, t.data = u.data,
                                 t.status = 'pending'
    WHEN NOT MATCHED THEN INSERT *

with the table PARTITIONED BY (bucket(N, path_hash)) and
write.distribution-mode=hash so the merge shuffles once on the bucket key.
This sandbox has no Iceberg runtime, so ``merge_upsert`` emits that SQL
when the session has a MERGE-capable catalog and otherwise falls back to a
semantically-identical parquet read-modify-write (same MERGE semantics,
verified by tests/test_upsert.py). Both paths are idempotent — re-running
a partition of updates converges, which is what makes checkpoint/resume
safe (SURVEY §4.1 'upsert-by-path = resume idempotency primitive').
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MERGE_SQL = """
MERGE INTO {target} t
USING {updates} u
ON t.path_hash = u.path_hash
WHEN MATCHED THEN UPDATE SET
  t.id = u.id, t.data = u.data, t.status = 'pending'
WHEN NOT MATCHED THEN INSERT *
""".strip()


def merge_upsert_iceberg(spark: SparkSession, target_table: str, updates: DataFrame) -> None:
    # same pre-dedupe as the parquet path: two updates for one path_hash
    # in a batch would otherwise throw MERGE's multiple-source-rows
    # cardinality error on the production path while the fallback
    # converged last-wins — the paths must behave identically
    _dedupe_updates(updates).createOrReplaceTempView("_upsert_updates")
    spark.sql(MERGE_SQL.format(target=target_table, updates="_upsert_updates"))


def _dedupe_updates(updates: DataFrame) -> DataFrame:
    """Multiple updates for one path in a batch: keep the last by id order
    (deterministic; mirrors 'latest save wins')."""
    from pyspark.sql import Window

    w = Window.partitionBy("path_hash").orderBy(F.desc("id"))
    return (
        updates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# per-column merge policy for matched rows (reference: on path_hash conflict
# update {id, data, status:'pending'}; everything stamped at first insert is
# preserved). Columns not listed take the update's value on match.
_PRESERVE_ON_MATCH = ("filename", "created_at")
_RESET_ON_MATCH = {"status": "pending"}


def merge_upsert_parquet(spark: SparkSession, target_path: str, updates: DataFrame) -> None:
    """Parquet fallback with MERGE semantics on path_hash.

    matched rows: updated id/data, status reset, created_at preserved;
    unmatched: inserted as-is. Written via a staging path + atomic rename
    so a crash mid-write never corrupts the target (resume-safe).

    SCHEMA EVOLUTION (S11, the reference's db.ts:28-76 migrate analog —
    but additive, never reset-on-mismatch: dropping a 10^12-row table on a
    schema change is not a cluster option): the merge is schema-driven over
    the UNION of target and update columns. A column new in the updates
    lands as NULL on untouched rows (Iceberg analog: ALTER TABLE ADD
    COLUMN before MERGE — the documented production path); a column the
    updates no longer carry is preserved from the target and NULL on fresh
    inserts.
    """
    staging = target_path.rstrip("/") + "._staging"
    final_tmp = target_path.rstrip("/") + "._old"
    # crash-window recovery: the swap below is two renames; dying between
    # them leaves the WHOLE table at ._old and nothing at the target — the
    # no-target branch would then rebuild the table from this batch alone,
    # silently dropping every prior row. Roll the rename forward first.
    if not os.path.exists(target_path) and os.path.exists(final_tmp):
        os.rename(final_tmp, target_path)

    updates = _dedupe_updates(updates)
    if not os.path.exists(target_path):
        updates.write.mode("overwrite").parquet(target_path)
        return
    current = spark.read.parquet(target_path)
    cur_cols, upd_cols = current.columns, set(updates.columns)
    all_cols = cur_cols + [c for c in updates.columns if c not in cur_cols]
    u = updates.select([F.col(c).alias(f"u_{c}") for c in updates.columns])
    from_update = F.col("u_path_hash").isNotNull()
    # matched = present on BOTH sides of the full outer join; a row present
    # only on the update side is a fresh INSERT and must keep the update's
    # values verbatim (MERGE's WHEN NOT MATCHED THEN INSERT *), not get the
    # matched-row status reset
    matched = from_update & F.col("path_hash").isNotNull()

    def merged_col(c: str):
        in_u, in_c = c in upd_cols, c in set(cur_cols)
        if not in_u:
            return F.col(c)            # update dropped it: preserve target
        if not in_c:
            return F.col(f"u_{c}")     # added column: NULL on untouched rows
        if c in _RESET_ON_MATCH:
            return (
                F.when(matched, F.lit(_RESET_ON_MATCH[c]))
                .when(from_update, F.col(f"u_{c}"))   # fresh insert: as-is
                .otherwise(F.col(c))
            )
        if c in _PRESERVE_ON_MATCH or c == "path_hash":
            return F.coalesce(c, f"u_{c}")
        # update wins WHEREVER the update side exists — F.when, not
        # coalesce: MERGE's UPDATE SET t.c = u.c writes an explicit NULL
        # from the update, which coalesce would silently swallow
        return F.when(from_update, F.col(f"u_{c}")).otherwise(F.col(c))

    merged = current.join(
        u, current.path_hash == u.u_path_hash, "full_outer"
    ).select(*[merged_col(c).alias(c) for c in all_cols])
    merged.write.mode("overwrite").parquet(staging)
    os.rename(target_path, final_tmp)
    os.rename(staging, target_path)
    import shutil

    shutil.rmtree(final_tmp, ignore_errors=True)


def merge_upsert(spark: SparkSession, target: str, updates: DataFrame) -> None:
    """Dispatch: Iceberg table name (contains no '/') → MERGE SQL;
    filesystem path → parquet fallback."""
    if "/" in target:
        merge_upsert_parquet(spark, target, updates)
    else:
        merge_upsert_iceberg(spark, target, updates)
