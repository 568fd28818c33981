"""Iceberg DDL for the production deployment (north_rule: Iceberg tables
with explicit doc_id bucket partitioning). This sandbox has no Iceberg
runtime, so these builders emit the exact statements a cluster session
executes (`spark.sql(...)` with the Iceberg catalog configured); shapes are
pinned by tests so the DDL can't drift from the parquet-fallback schemas.

Partitioning rationale per table:
- documents / extracted_spans: `bucket(N, doc_id)` — co-locates a doc's
  rows for the MERGE upsert and makes resume per-bucket idempotent
  (jobs/extract.py writes and overwrites exactly these partitions).
- chunks: bucketed by doc_id too, NOT chunk_id — hydration joins chunks to
  documents far more often than point-looks-up chunks.
- lineage / metrics: partitioned by run_id — pruned to one run on resume.
- embeddings: bucket on the FK id; the ANN path re-partitions by cell/bucket
  at index build, which lives in its own table version.
"""

from __future__ import annotations

DEFAULT_BUCKETS = 4096  # 10^12 docs / 4096 ≈ 250M docs per bucket family;
                        # resume granularity and merge shuffle width dial


def create_documents(table: str, buckets: int = DEFAULT_BUCKETS) -> str:
    return f"""
CREATE TABLE IF NOT EXISTS {table} (
  id STRING, path_hash STRING, filename STRING, content_hash STRING,
  status STRING, data STRUCT<vendor: STRING, amount: DOUBLE>,
  created_at TIMESTAMP
) USING iceberg
PARTITIONED BY (bucket({buckets}, path_hash))
TBLPROPERTIES ('write.distribution-mode' = 'hash',
               'format-version' = '2',
               'write.merge.mode' = 'merge-on-read')
""".strip()


def create_extracted_spans(table: str, buckets: int = DEFAULT_BUCKETS) -> str:
    return f"""
CREATE TABLE IF NOT EXISTS {table} (
  doc_id STRING, `order` INT, kind STRING, text STRING, media_ref STRING,
  parse_failure BOOLEAN
) USING iceberg
PARTITIONED BY (bucket({buckets}, doc_id))
TBLPROPERTIES ('write.distribution-mode' = 'hash', 'format-version' = '2')
""".strip()


def create_chunks(table: str, buckets: int = DEFAULT_BUCKETS) -> str:
    return f"""
CREATE TABLE IF NOT EXISTS {table} (
  chunk_id STRING, doc_id STRING, chunk_index INT, content STRING
) USING iceberg
PARTITIONED BY (bucket({buckets}, doc_id))
TBLPROPERTIES ('write.distribution-mode' = 'hash', 'format-version' = '2')
""".strip()


def create_lineage(table: str) -> str:
    return f"""
CREATE TABLE IF NOT EXISTS {table} (
  run_id STRING, stage STRING, partition_id INT, status STRING,
  docs_in BIGINT, docs_out BIGINT, spans_out BIGINT, parse_failures BIGINT,
  wall_ms BIGINT, finished_at TIMESTAMP
) USING iceberg
PARTITIONED BY (run_id)
""".strip()


def add_column(table: str, col: str, sql_type: str) -> str:
    """The S11 schema-evolution path: additive, metadata-only in Iceberg —
    pre-existing rows read the new column as NULL, exactly the semantics
    the parquet-fallback MERGE implements (sinks/upsert.py)."""
    return f"ALTER TABLE {table} ADD COLUMN {col} {sql_type}"


def merge_upsert(target: str, updates_view: str) -> str:
    """The documents MERGE (same statement sinks/upsert.py issues)."""
    return f"""
MERGE INTO {target} t
USING {updates_view} u
ON t.path_hash = u.path_hash
WHEN MATCHED THEN UPDATE SET
  t.id = u.id, t.data = u.data, t.status = 'pending'
WHEN NOT MATCHED THEN INSERT *
""".strip()


def all_ddl(prefix: str = "warehouse", buckets: int = DEFAULT_BUCKETS) -> list[str]:
    return [
        create_documents(f"{prefix}.documents", buckets),
        create_extracted_spans(f"{prefix}.extracted_spans", buckets),
        create_chunks(f"{prefix}.chunks", buckets),
        create_lineage(f"{prefix}.lineage"),
    ]
