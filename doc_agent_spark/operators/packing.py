"""Sequence packing: concatenate-and-chunk documents into fixed-size
token windows — the step that turns a curated corpus into training
examples (GPT-style packing: the token stream is concatenated in a
deterministic order and split every ``budget`` tokens, so documents may
straddle window boundaries; nothing is padded, nothing is dropped).

Reference scope: doc-agent stops at extraction/search; packing is part of
the training-data-pipeline surface this engine adds on top (brief:
"operations a large-scale training-data pipeline would need").

Scale design — the whole point is avoiding a GLOBAL token order, which
would be a single-partition window (one task sees 100 TB):

- Documents are assigned to ``n_shards`` independent streams by a content
  hash of the key (layout-independent, cluster-size-independent), and the
  deterministic order WITHIN a shard is the hash itself. Each shard packs
  independently, so the only shuffle is a hash partition on ``shard`` and
  every window is bounded by corpus_size / n_shards. At 100 TB you raise
  ``n_shards`` to O(executor count × k): packing parallelism scales
  linearly and no task ever materializes more than one shard's doc keys.
- The exclusive running sum (each doc's start offset in its shard's token
  stream) is one window aggregate; bins are then pure arithmetic and a
  ``sequence()`` explode — docs only emit extra rows for the windows they
  straddle (≤ 1 + tokens/budget rows per doc).
- Output rows are (shard, seq_id, doc slice) assignments — the SLICING
  PLAN, not token arrays; the actual token materialization is a narrow
  downstream map over (doc text, slice offsets) that never shuffles.

Everything is relational (window + sequence explode), so the identical
computation is expressible in the DuckDB oracle; md5-based shard/order
make the two engines agree byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _order_hash(key: Column, seed: str) -> Column:
    """8-hex-char content hash: shard assignment + within-shard order."""
    return F.substring(
        F.md5(F.concat(F.lit(f"{seed}:"), key.cast("string"))), 1, 8
    )


def shard_of(key: Column, n_shards: int, seed: str = "pack42") -> Column:
    """The packing stream a key belongs to — exposed so callers (e.g. the
    resumable pack job) can pre-filter completed shards with the exact
    expression pack_chunks uses internally."""
    return (F.conv(_order_hash(key, seed), 16, 10).cast("long") % n_shards).cast("int")


def pack_chunks(
    df: DataFrame,
    tokens_col: str,
    key_col: str,
    budget: int,
    n_shards: int = 64,
    seed: str = "pack42",
    stream_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Assign each document to the fixed-size token windows it occupies.

    Returns one row per (document × window it overlaps):
      shard        — independent packing stream (content-hash of key)
      seq_id       — window index within the shard's concatenated stream
      <key_col>    — the document key
      slice_start  — first token of the slice, offset WITHIN the document
      slice_len    — tokens contributed to this window (1..budget)
      seq_offset   — where the slice lands WITHIN the window (0..budget-1)

    Deterministic under repartitioning and cluster size (hash order), and
    exactly conservative: per document, sum(slice_len) == its token count;
    per (shard, seq_id) except a shard's last window, sum(slice_len) ==
    budget with contiguous seq_offsets.

    Zero-token documents are excluded (they occupy no window; emitting a
    zero-length slice would pin them to an arbitrary boundary).

    ``stream_cols`` prepend extra partition columns to the packing stream
    (e.g. a train/val/test ``split`` column so windows never mix splits):
    each distinct (stream_cols…, shard) packs independently and the
    columns are carried through to the output.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")

    key = F.col(key_col)
    tokens = F.col(tokens_col).cast("long")
    oh = _order_hash(key, seed)
    # 32-bit hex → long; mod keeps the full hash available as the order key
    shard = shard_of(key, n_shards, seed)

    stream = [*stream_cols, "shard"]
    w = (
        Window.partitionBy(*stream)
        .orderBy("order_hash", key_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    staged = (
        df.select(*stream_cols, key, tokens.alias("_tokens"),
                  oh.alias("order_hash"), shard.alias("shard"))
        .filter(F.col("_tokens") > 0)
        .withColumn("start", F.coalesce(F.sum("_tokens").over(w), F.lit(0).cast("long")))
    )

    b = F.lit(budget).cast("long")
    # integer DIV, not `/`+cast: float64 loses exactness past 2^53 token
    # offsets (a 100 TB stream is ~2^44 — headroom, not hypothetical)
    first_bin = F.expr(f"start DIV {budget}")
    last_bin = F.expr(f"(start + _tokens - 1) DIV {budget}")
    binned = staged.withColumn("seq_id", F.explode(F.sequence(first_bin, last_bin)))

    win_lo = F.col("seq_id") * b                    # window start, stream coords
    doc_lo = F.greatest(win_lo, F.col("start"))     # slice start, stream coords
    doc_hi = F.least(win_lo + b, F.col("start") + F.col("_tokens"))
    return binned.select(
        *stream_cols,
        "shard",
        "seq_id",
        key_col,
        (doc_lo - F.col("start")).alias("slice_start"),
        (doc_hi - doc_lo).alias("slice_len"),
        (doc_lo - win_lo).alias("seq_offset"),
    )


def assemble_windows(
    plan: DataFrame,
    docs: DataFrame,
    tokens: Column,
    key_col: str,
    stream_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Materialize the packed training sequences: join the slicing plan
    back to the documents, cut each document's token array at the planned
    slice offsets, and assemble every window's pieces in seq_offset order.

    ``tokens`` is the tokenizer expression over ``docs`` (an array<string>
    column — e.g. the BPE-ish pretoken regexp); the slice arithmetic is in
    its token space, so it must be the SAME tokenizer whose counts built
    the plan. Returns one row per (stream…, shard, seq_id) with the
    concatenated ``window_tokens`` array and its length ``n_tokens``
    (== budget except each stream's final window).

    Scale shape: one equi-join on the doc key (plan side carries only
    offsets — the token arrays never ride the plan's explode), then one
    aggregation keyed by the window. No per-row Python; slicing and
    flatten are JVM expressions."""
    sliced = (
        plan.join(docs.select(F.col(key_col), tokens.alias("_toks")), key_col)
        .withColumn(
            "piece",
            F.slice(F.col("_toks"), F.col("slice_start").cast("int") + 1,
                    F.col("slice_len").cast("int")),
        )
    )
    keys = [*stream_cols, "shard", "seq_id"]
    return (
        sliced.groupBy(*keys)
        .agg(
            F.flatten(
                F.array_sort(F.collect_list(F.struct("seq_offset", "piece")))
                .getField("piece")
            ).alias("window_tokens")
        )
        .withColumn("n_tokens", F.size("window_tokens").cast("long"))
    )


def pack_chunks_sql(
    source_sql: str,
    tokens_expr: str,
    key_expr: str,
    budget: int,
    n_shards: int = 64,
    seed: str = "pack42",
    key_alias: str = "k",
) -> str:
    """DuckDB mirror of :func:`pack_chunks` (same hash, same windows, same
    arithmetic). ``source_sql`` must expose ``key_expr`` and
    ``tokens_expr``; returns a full SELECT with the key column named
    ``key_alias`` (match it to the Spark side's key column)."""
    oh = f"substr(md5('{seed}:' || CAST({key_expr} AS VARCHAR)), 1, 8)"
    return f"""
WITH src AS (
  SELECT {key_expr} AS k, CAST({tokens_expr} AS BIGINT) AS tokens,
         {oh} AS order_hash,
         CAST(CAST('0x' || {oh} AS BIGINT) % {n_shards} AS INTEGER) AS shard
  FROM ({source_sql})
),
staged AS (
  SELECT *, coalesce(sum(tokens) OVER (
      PARTITION BY shard ORDER BY order_hash, k
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
  FROM src WHERE tokens > 0
),
binned AS (
  SELECT shard, k, tokens, start,
         unnest(range(CAST(start // {budget} AS BIGINT),
                      CAST((start + tokens - 1) // {budget} + 1 AS BIGINT))) AS seq_id
  FROM staged
)
SELECT shard, seq_id, k AS {key_alias},
       CAST(greatest(seq_id * {budget}, start) - start AS BIGINT) AS slice_start,
       CAST(least((seq_id + 1) * {budget}, start + tokens)
         - greatest(seq_id * {budget}, start) AS BIGINT) AS slice_len,
       CAST(greatest(seq_id * {budget}, start) - seq_id * {budget} AS BIGINT) AS seq_offset
FROM binned
""".strip()


def shuffle_windows(
    windows: DataFrame,
    seed: str = "shuffle42",
    partitions: int | None = None,
    stream_cols: tuple[str, ...] = ("split",),
) -> DataFrame:
    """Deterministic global pseudo-random training order for packed
    windows — the "shuffle the corpus before training" step. Every window
    gets ``order_key = md5(seed:stream…:shard:seq_id)`` (a pure function
    of the window's identity, so the order is reproducible and
    layout/cluster-size independent), and the frame is range-partitioned +
    sorted by that key: reading the written files in partition order IS
    the shuffled order, with no single-partition global sort.

    Scale: one range exchange (RangePartitioner samples boundaries —
    sample-dependent boundaries only move rows between adjacent files;
    the TOTAL order, each partition a contiguous sorted key range, is the
    same regardless), then a per-partition sort. Re-keying with a new
    seed re-shuffles for another epoch without touching the window
    payloads."""
    key = F.md5(
        F.concat_ws(
            ":", F.lit(seed), *[F.col(c) for c in stream_cols],
            F.col("shard").cast("string"), F.col("seq_id").cast("string"),
        )
    )
    out = windows.withColumn("order_key", key)
    p = partitions or windows.sparkSession.sparkContext.defaultParallelism
    return out.repartitionByRange(p, "order_key").sortWithinPartitions(
        "order_key"
    )
