"""Streaming operators beyond sessionization: watermarked windowed counts
(late-data drop) and streaming exact dedup with bounded state."""

from __future__ import annotations

import datetime as dt

import pytest

from doc_agent_spark.streaming.pipeline import dedup_stream, events_windowed_counts

def _t(minute, hour=10):
    return dt.datetime(2024, 1, 1, hour, minute)


def test_dedup_stream_first_seen_wins(spark, tmp_path):
    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    SCHEMA = "doc_id long, ts timestamp, text string"
    # batch 1: two distinct texts, one internal dup
    spark.createDataFrame(
        [(1, _t(0), "alpha"), (2, _t(1), "alpha"), (3, _t(2), "beta")], SCHEMA
    ).coalesce(1).write.parquet(in_dir + "/b1")
    # batch 2: cross-batch dup of 'alpha' within the watermark + new text
    spark.createDataFrame(
        [(4, _t(10), "alpha"), (5, _t(11), "gamma")], SCHEMA
    ).coalesce(1).write.parquet(in_dir + "/b2")

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir + "/*")
    )
    q = (
        dedup_stream(stream, watermark="1 hour")
        .writeStream.format("memory").queryName("dedup_out")
        .outputMode("append").option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT doc_id, text FROM dedup_out").collect()
    kept = sorted((r.doc_id, r.text) for r in rows)
    # first-seen doc per distinct text; cross-batch dup 4 suppressed
    assert kept == [(1, "alpha"), (3, "beta"), (5, "gamma")]


def test_windowed_counts_drop_late_data(spark, tmp_path):
    """Sequential available-now drains against one checkpoint give strict
    micro-batch ordering (a single drain can reorder files with equal
    mtimes): on-time events → watermark-advancing event → a LATE event for
    the long-closed window, which must be dropped."""
    in_dir, ckpt, out = (str(tmp_path / x) for x in ("in", "ckpt", "out"))
    SCHEMA = "event_id long, ts timestamp, event_type string, value double"

    def drain(batch_rows, name):
        spark.createDataFrame(batch_rows, SCHEMA).coalesce(1).write.parquet(
            f"{in_dir}/{name}"
        )
        stream = spark.readStream.schema(SCHEMA).parquet(in_dir + "/*")
        q = (
            events_windowed_counts(stream, window="1 hour", watermark="2 hours")
            .writeStream.format("parquet").option("path", out)
            .outputMode("append").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    drain([(1, _t(5), "click", 1.0), (2, _t(20), "click", 1.0)], "b1")
    drain([(3, _t(0, hour=20), "click", 1.0)], "b2")   # advances watermark
    drain([(4, _t(30), "click", 1.0)], "b3")           # late → dropped
    rows = (
        spark.read.parquet(out)
        .selectExpr("window.start AS ws", "n_events")
        .collect()
    )
    finalized = {r.ws: r.n_events for r in rows}
    # the 10:00 window finalized with exactly the two on-time events;
    # the late batch-3 event did not reopen or grow it
    assert finalized[_t(0)] == 2


def test_events_stream_to_memory_matches_batch(spark, tmp_path):
    """The readStream variant of the events aggregation must reproduce the
    batch groupBy over the same files."""
    from pyspark.sql import functions as F

    from doc_agent_spark.streaming.pipeline import events_stream_to_memory

    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    SCHEMA = ("event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double, props string")
    rows = [
        (i, _t(i % 50), i % 7, ["click", "view"][i % 2], float(i), "{}")
        for i in range(200)
    ]
    spark.createDataFrame(rows, SCHEMA).coalesce(2).write.parquet(in_dir)

    q = events_stream_to_memory(spark, in_dir, ckpt, query_name="ev_counts")
    q.awaitTermination(120)
    got = {
        (r.event_type, r.ws): (r.n_events, r.sum_value)
        for r in spark.sql(
            "SELECT event_type, window.start AS ws, n_events, sum_value FROM ev_counts"
        ).collect()
    }
    batch = (
        spark.read.parquet(in_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sv"))
        .collect()
    )
    expected = {(r.event_type, r.w.start): (r.n, r.sv) for r in batch}
    assert got == expected


def test_curate_stream_matches_batch_semantics(spark, tmp_path):
    """curate_stream: streaming dedup + the stateless funnel stages produce
    the same kept set as the batch rules on a drained stream, and PII is
    redacted on the way out."""
    from doc_agent_spark.functions import textfns
    from doc_agent_spark.streaming.pipeline import curate_stream

    in_dir, ckpt = str(tmp_path / "cin"), str(tmp_path / "cckpt")
    SCHEMA = "doc_id long, ts timestamp, text string"
    good = ("the quick document talks about the data and the pipeline "
            "with plenty of the usual english filler words for quality " * 3)
    rows1 = [(1, _t(0), good + "contact user1@example.com"),
             (2, _t(1), good + "contact user1@example.com"),  # dup of 1
             (3, _t(2), "xx")]                                # fails quality
    rows2 = [(4, _t(10), good + "another unique tail here")]
    spark.createDataFrame(rows1, SCHEMA).coalesce(1).write.parquet(in_dir + "/b1")
    spark.createDataFrame(rows2, SCHEMA).coalesce(1).write.parquet(in_dir + "/b2")

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir + "/*")
    )
    q = (
        curate_stream(stream, min_quality=0.3, langs=["en"])
        .writeStream.format("memory").queryName("curate_out")
        .outputMode("append").option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {r.doc_id: r for r in
           spark.sql("SELECT * FROM curate_out").collect()}
    assert set(got) == {1, 4}          # dup 2 dropped, low-quality 3 dropped
    assert "user1@example.com" not in got[1].text
    assert "[EMAIL]" in got[1].text or "@" not in got[1].text
    assert got[1].pred_lang == "en" and got[1].quality >= 0.3


def test_minhash_band_structs_match_relational_table(spark):
    from pyspark.sql import functions as F

    from doc_agent_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, f"the quick brown fox {i % 4} jumps over the lazy dog {i % 4}")
         for i in range(40)] + [(99, "")],
        "doc_id long, text string",
    )
    rel = dedup.minhash_band_table(docs)
    row = docs.select(
        F.col("doc_id").alias("id"),
        F.explode(dedup.minhash_band_structs(F.col("text"))).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    assert sorted(map(tuple, rel.collect())) == sorted(map(tuple, row.collect()))


def test_near_dup_stream_flags_against_persisted_bands(spark, tmp_path):
    from pyspark.sql import functions as F

    from doc_agent_spark.operators import dedup
    from doc_agent_spark.streaming.pipeline import near_dup_stream

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "one two three four five six seven"),
         (3, "completely different words here now")],
        "doc_id long, text string",
    )
    bands_dir = str(tmp_path / "bands")
    dedup.minhash_band_table(corpus).write.parquet(bands_dir)
    band_table = spark.read.parquet(bands_dir)

    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    SCHEMA = "doc_id long, ts timestamp, text string"
    spark.createDataFrame(
        [(10, _t(0), "alpha beta gamma delta epsilon zeta"),   # near-dup of 1
         (11, _t(1), "utterly novel vocabulary nothing shared"),
         (12, _t(2), "")],                                     # shingle-less
        SCHEMA,
    ).coalesce(1).write.parquet(in_dir + "/b1")

    stream = spark.readStream.schema(SCHEMA).parquet(in_dir + "/*")
    q = (
        near_dup_stream(stream, band_table)
        .writeStream.format("memory").queryName("neardup_out")
        .outputMode("append").option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.id, r.matched_id)
        for r in spark.sql("SELECT id, matched_id FROM neardup_out").collect()
    )
    # batch equivalence: stream docs' bands joined against the same table
    batch_docs = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta"),
         (11, "utterly novel vocabulary nothing shared"),
         (12, "")],
        "doc_id long, text string",
    )
    expected = sorted(
        (r.id, r.matched_id)
        for r in dedup.minhash_band_table(batch_docs)
        .join(band_table.select(F.col("id").alias("matched_id"), "band", "bucket"),
              ["band", "bucket"])
        .select("id", "matched_id").distinct().collect()
    )
    assert got == expected
    assert (10, 1) in got                      # the true near-dup is flagged
    assert all(i != 12 for i, _ in got)        # shingle-less doc emits nothing


def test_click_attribution_stream_interval_join(spark, tmp_path):
    """Stream-stream interval join: a click attributes to the impression
    of the same ad within the horizon; outside-horizon and wrong-ad
    clicks produce no row. Both sides arrive as file streams."""
    from doc_agent_spark.streaming.pipeline import click_attribution_stream

    imp_dir, clk_dir, ckpt, out = (
        str(tmp_path / x) for x in ("imp", "clk", "ckpt", "out"))
    IMP = "imp_id long, ad_id long, imp_ts timestamp"
    CLK = "click_id long, ad_id long, click_ts timestamp"

    spark.createDataFrame(
        [(1, 100, _t(0)), (2, 200, _t(0)), (3, 100, _t(30))], IMP
    ).coalesce(1).write.parquet(imp_dir + "/b1")
    spark.createDataFrame(
        [
            (10, 100, _t(10)),          # joins imp 1 (and not imp 3: before it)
            (11, 200, _t(0, hour=12)),  # outside 1h horizon of imp 2
            (12, 300, _t(5)),           # no impression for ad 300
            (13, 100, _t(40)),          # joins imps 1 AND 3 (both in horizon)
        ],
        CLK,
    ).coalesce(1).write.parquet(clk_dir + "/b1")

    i = spark.readStream.schema(IMP).parquet(imp_dir + "/*")
    c = spark.readStream.schema(CLK).parquet(clk_dir + "/*")
    q = (
        click_attribution_stream(i, c, horizon="1 hour", watermark="2 hours")
        .writeStream.format("parquet").option("path", out)
        .outputMode("append").option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.click_id, r.imp_id) for r in spark.read.parquet(out).collect()
    )
    assert got == [(10, 1), (13, 1), (13, 3)]


def test_publish_stream_manifest_merges_to_batch(spark, tmp_path):
    """Streaming publish over two increments: the summed per-batch manifest
    deltas equal the batch job's manifest over the union input (the
    digest-sum mergeability property), and re-checksumming the streamed
    bytes against the merged manifest verifies clean."""
    from pyspark.sql import functions as F

    from doc_agent_spark.operators import publish as pubops
    from doc_agent_spark.streaming.pipeline import (
        merged_stream_manifest,
        publish_stream,
    )

    ind = str(tmp_path / "in")
    out = str(tmp_path / "pub")
    ck = str(tmp_path / "ck")
    schema = "doc_id long, text string, lang string"
    batch1 = [(i, f"body {i}", "en") for i in range(40)]
    batch2 = [(i, f"body {i}", "de") for i in range(40, 70)]
    spark.createDataFrame(batch1, schema).write.mode("append").parquet(ind)

    stream = spark.readStream.schema(schema).parquet(ind)
    q = publish_stream(stream, out, ck, shards=4)
    q.awaitTermination(60)

    spark.createDataFrame(batch2, schema).write.mode("append").parquet(ind)
    q = publish_stream(spark.readStream.schema(schema).parquet(ind), out, ck, shards=4)
    q.awaitTermination(60)

    merged = merged_stream_manifest(spark, out + "_manifest")
    ref = pubops.shard_manifest(
        spark.createDataFrame(batch1 + batch2, schema).select(
            pubops.json_line("doc_id", "lang", "text").alias("line"), "doc_id"
        ),
        n_shards=4,
    )
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in ref.collect()}

    vm = pubops.verify_shards(spark, out + "_shards", merged, line_col="value")
    assert vm.filter(~F.col("ok")).count() == 0

    # mixed-writer guard: the batch repair job touching the stream's output
    # under a different shard mapping must fail fast, not silently re-shard
    with pytest.raises(ValueError, match="config mismatch"):
        pubops.check_or_write_config(
            out, {"shards": 64, "columns": ["doc_id", "lang", "text"],
                  "seed": "publish42", "key_col": "doc_id"},
        )


def test_frontier_stream_matches_batch_semantics(spark, tmp_path):
    from pyspark.sql import functions as F

    from doc_agent_spark.operators import frontier as frontops
    from doc_agent_spark.streaming.pipeline import frontier_stream

    seen_dir = str(tmp_path / "fseen")
    spark.createDataFrame(
        [("https://a.com/i.html",), ("https://a.com/old.html",)], "url string"
    ).write.parquet(seen_dir)
    seen = spark.read.parquet(seen_dir)
    rules = frontops.parse_robots(spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /private/\n")],
        "host string, body string",
    ))

    in_dir, ckpt = str(tmp_path / "fin"), str(tmp_path / "fckpt")
    SCHEMA = "url string, ts timestamp, text string"
    spark.createDataFrame(
        [
            ("https://a.com/i.html", _t(0),
             '<a href="/new1.html">1</a><a href="/private/x">p</a>'
             '<a href="/old.html">o</a>'),
            # second page cites new1 again inside the watermark: the
            # stream must emit the url ONCE
            ("https://a.com/j.html", _t(1), '<a href="new1.html">1</a>'),
        ],
        SCHEMA,
    ).coalesce(1).write.parquet(in_dir + "/b1")

    stream = spark.readStream.schema(SCHEMA).parquet(in_dir + "/*")
    q = (
        frontier_stream(stream, seen, rules)
        .writeStream.format("memory").queryName("frontier_out")
        .outputMode("append").option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {r.url: r.host for r in
           spark.sql("SELECT url, host FROM frontier_out").collect()}
    # seen urls excluded, robots-blocked excluded, new1 emitted exactly once
    assert got == {"https://a.com/new1.html": "a.com"}
