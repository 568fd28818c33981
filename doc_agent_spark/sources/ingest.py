"""Resilient semi-structured ingest: JSONL / CSV with corrupt-record
quarantine.

At 10^12 rows a crawl drop ALWAYS contains malformed records — truncated
lines from killed writers, mixed encodings, schema drift. FAILFAST dies on
the first one (hours into the job), DROPMALFORMED silently deletes data.
The production shape is PERMISSIVE + columnNameOfCorruptRecord: malformed
rows land whole in a quarantine column in the same single pass, the clean
side proceeds, and the quarantine side is persisted for replay/triage.
Both reads take an EXPLICIT schema — schema inference is a full extra scan
of the corpus and a determinism hazard (sampled inference can flip types
between runs); at scale the schema is a contract, not a discovery.

Spark refuses queries that reference ONLY the corrupt column (it is
populated during parsing, so a corrupt-only projection could skip parsing
the data columns entirely); ``split_quarantine`` therefore keeps the full
row on both sides, which is also what triage wants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: str, corrupt_col: str) -> str:
    return f"{schema}, {corrupt_col} string"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    corrupt_col: str = CORRUPT_COL,
) -> DataFrame:
    """PERMISSIVE JSON-lines read: schema is a DDL string WITHOUT the
    corrupt column (added here). Malformed lines — broken JSON, type
    mismatches under strict parsing — arrive with data columns null and
    the raw line in ``corrupt_col``."""
    return (
        spark.read.schema(_with_corrupt(schema, corrupt_col))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    corrupt_col: str = CORRUPT_COL,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """PERMISSIVE CSV read with the same quarantine contract: rows with
    too many fields or unparseable types carry the raw line in
    ``corrupt_col``."""
    return (
        spark.read.schema(_with_corrupt(schema, corrupt_col))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .option("header", str(header).lower())
        .option("sep", sep)
        .csv(path)
    )


def split_quarantine(
    df: DataFrame, corrupt_col: str = CORRUPT_COL, materialize: bool = False
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): clean rows lose the corrupt column; quarantine
    rows keep every column (nulls show which fields DID parse — CSV keeps
    the parseable prefix). One scan serves both when the caller persists
    or foreaches them from a shared cached/checkpointed frame.

    ``materialize=True`` caches the parsed frame first — required before
    corrupt-only projections like ``quarantine.count()``, which Spark
    rejects on a raw file scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN: the
    corrupt column is populated *during* parsing, so a corrupt-only plan
    could skip parsing entirely). At corpus scale, write the parsed frame
    to a staging table instead of caching and split from that.
    """
    if materialize:
        df = df.cache()
    clean = df.filter(df[corrupt_col].isNull()).drop(corrupt_col)
    quarantine = df.filter(df[corrupt_col].isNotNull())
    return clean, quarantine
