"""All engine StructTypes (SURVEY §1).

Input contract (BASELINE.json input_hint):
  documents(doc_id: string,
            spans: array<struct<kind:string,text:string,media_ref:string,offset:int>>)
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SPAN = StructType([
    StructField("kind", StringType(), False),
    StructField("text", StringType(), True),
    StructField("media_ref", StringType(), True),
    StructField("offset", IntegerType(), False),
])

DOCUMENTS_SPANS = StructType([
    StructField("doc_id", StringType(), False),
    StructField("spans", ArrayType(SPAN), False),
])

LINE_ITEM = StructType([
    StructField("description", StringType(), False),
    StructField("quantity", DoubleType(), True),
    StructField("unit_price", DoubleType(), True),
    StructField("total", DoubleType(), True),
])

# DocumentData (core/src/index.ts:2-13), snake_case, typed struct not JSON.
DOC_DATA = StructType([
    StructField("id", StringType(), False),
    StructField("doc_id", StringType(), False),
    StructField("type", StringType(), False),
    StructField("vendor", StringType(), True),
    StructField("amount", DoubleType(), True),
    StructField("date", StringType(), True),       # normalized YYYY-MM-DD (kept string, like reference)
    StructField("date_raw", StringType(), True),
    StructField("account_number", StringType(), True),
    StructField("items", ArrayType(LINE_ITEM), True),
    StructField("raw_text", StringType(), True),
    StructField("parse_failure", BooleanType(), False),
])

OUT_SPAN = StructType([
    StructField("order", IntegerType(), False),
    StructField("kind", StringType(), False),
    StructField("text", StringType(), False),
    StructField("media_ref", StringType(), False),
])

# Flat output of the extraction pipeline: one row per emitted span.
EXTRACTED_SPANS = StructType([
    StructField("doc_id", StringType(), False),
    StructField("order", IntegerType(), False),
    StructField("kind", StringType(), False),
    StructField("text", StringType(), False),
    StructField("media_ref", StringType(), False),
])

# Doc-level extraction result (docdata + nested out_spans array).
EXTRACTION_RESULT = StructType(
    DOC_DATA.fields + [StructField("out_spans", ArrayType(OUT_SPAN), False)]
)

# Per-partition lineage for checkpoint/resume (SURVEY §4.2.3).
LINEAGE = StructType([
    StructField("run_id", StringType(), False),
    StructField("stage", StringType(), False),
    StructField("partition_id", IntegerType(), False),
    StructField("status", StringType(), False),
    StructField("docs_in", LongType(), False),
    StructField("docs_out", LongType(), False),
    StructField("spans_out", LongType(), False),
    StructField("parse_failures", LongType(), False),
    StructField("wall_ms", LongType(), False),
    StructField("finished_at", TimestampType(), False),
])

# Extraction metrics rollup (north_star: docs processed, spans emitted,
# parse failures).
METRICS = StructType([
    StructField("run_id", StringType(), False),
    StructField("stage", StringType(), False),
    StructField("docs_processed", LongType(), False),
    StructField("spans_emitted", LongType(), False),
    StructField("parse_failures", LongType(), False),
])

# Persistence row (storage/src/schema.ts:4-14): id, path_hash UNIQUE,
# filename, content_hash, status, data (typed struct), created_at.
STORED_DOCUMENT = StructType([
    StructField("id", StringType(), False),
    StructField("path_hash", StringType(), False),
    StructField("filename", StringType(), False),
    StructField("content_hash", StringType(), True),
    StructField("status", StringType(), False),
    StructField("data", DOC_DATA, False),
    StructField("created_at", TimestampType(), False),
])
