"""Structured Streaming surface.

The reference has NO streaming dataflow (SURVEY §2.7) — its 'stream' is a
progress callback. This module exists for the continuous-ingest deployment
mode: the SAME extraction transformation applied to a file stream, plus an
event-time windowed aggregation with watermarked late-data handling for the
metrics feed. Batch and streaming share one code path (extractor.extract is
a mapInPandas over a streaming-compatible plan), so span outputs are
byte-identical to the batch pipeline — tests assert exactly that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import extractor
from ..schema import DOCUMENTS_SPANS


def extract_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """File-source stream of spans tables → extracted flat spans (parquet).

    ``available_now=True`` drains everything currently present and stops —
    the batch-equivalence mode used in tests; production runs keep the
    default micro-batch trigger and the checkpoint gives exactly-once file
    sink semantics (the streaming analog of the lineage/resume contract).
    """
    docs = (
        spark.readStream.schema(DOCUMENTS_SPANS)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_dir)
    )
    flat = extractor.extracted_spans(docs)
    writer = (
        flat.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def events_windowed_counts(events: DataFrame, window: str = "1 hour",
                           watermark: str = "2 hours") -> DataFrame:
    """Watermarked event-time windowed aggregation (late data beyond the
    watermark dropped): per (window, event_type) counts + value sum."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col("event_type"))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
    )


def events_stream_to_memory(spark: SparkSession, input_dir: str, checkpoint_dir: str,
                            query_name: str = "events_counts"):
    """readStream variant of the events aggregation (file source), writing
    to the in-memory sink for inspection/tests."""
    from ..schema import StructType  # noqa: F401  (schema import below)
    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType, TimestampNTZType,
    )

    schema = StructType([
        StructField("event_id", LongType()),
        StructField("ts", TimestampNTZType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ])
    ev = spark.readStream.schema(schema).parquet(input_dir)
    ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = events_windowed_counts(ev)
    return (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
