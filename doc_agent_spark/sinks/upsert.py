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
    updates.createOrReplaceTempView("_upsert_updates")
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


def merge_upsert_parquet(spark: SparkSession, target_path: str, updates: DataFrame) -> None:
    """Parquet fallback with MERGE semantics on path_hash.

    matched rows: updated id/data, status reset, created_at preserved;
    unmatched: inserted as-is. Written via a staging path + atomic rename
    so a crash mid-write never corrupts the target (resume-safe).
    """
    updates = _dedupe_updates(updates)
    if not os.path.exists(target_path):
        updates.write.mode("overwrite").parquet(target_path)
        return
    current = spark.read.parquet(target_path)
    u = updates.select(
        F.col("path_hash").alias("u_path_hash"),
        F.col("id").alias("u_id"),
        F.col("data").alias("u_data"),
        F.col("filename").alias("u_filename"),
        F.col("content_hash").alias("u_content_hash"),
        F.col("status").alias("u_status"),
        F.col("created_at").alias("u_created_at"),
    )
    merged = (
        current.join(u, current.path_hash == u.u_path_hash, "full_outer")
        .select(
            F.coalesce("u_id", "id").alias("id"),
            F.coalesce("path_hash", "u_path_hash").alias("path_hash"),
            F.coalesce("filename", "u_filename").alias("filename"),
            F.coalesce("u_content_hash", "content_hash").alias("content_hash"),
            F.when(F.col("u_path_hash").isNotNull(), F.lit("pending"))
            .otherwise(F.col("status")).alias("status"),
            F.coalesce("u_data", "data").alias("data"),
            # created_at preserved from first insert (matched case)
            F.coalesce("created_at", "u_created_at").alias("created_at"),
        )
    )
    staging = target_path.rstrip("/") + "._staging"
    merged.write.mode("overwrite").parquet(staging)
    final_tmp = target_path.rstrip("/") + "._old"
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
