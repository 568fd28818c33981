"""Document chunking — the reference's core retrieval data model
(`Chunk{id, documentId, content, index, metadata}`,
/root/reference/SEMANTIC-SEARCH-ROADMAP.md:362-373; strategies table :47-49;
`chunks` storage schema :91-96). Search retrieves CHUNKS and hydrates
documents through the chunk→document FK (roadmap :41).

All strategies are pure column expressions (split/transform/posexplode) —
chunking is a NARROW map over the corpus: no shuffle, no Python, scales as
a projection inside the scan stage. Chunk ids are deterministic
(md5(doc_id:index)) so re-chunking is idempotent across runs and cluster
sizes — the upsert/resume story needs stable ids.

Strategies (roadmap :47-49):
- ``line``: split on blank-line groups (paragraph blocks) — receipts,
  invoices.
- ``sentence``: sentence-boundary split. The reference uses an NLP
  tokenizer; we use the portable regex form ``[^.!?]+[.!?]*`` (RE2-safe —
  no lookbehind) so the DuckDB oracle reproduces it exactly.
- ``semantic``: the reference plans LLM-assisted boundary detection
  (roadmap :347). No LLM runs in this engine's data plane, so this is a
  DETERMINISTIC PROXY: fixed ``words_per_chunk`` windows over whitespace
  tokens (content is whitespace-normalized by reconstruction). The Spark
  plumbing (schema, ids, explode shape) is the real thing; swap the
  boundary function when a model is available.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHUNK_STRATEGIES = ("line", "sentence", "semantic")


def _pieces(text, strategy: str, words_per_chunk: int):
    if strategy == "line":
        raw = F.split(text, r"\n\s*\n")
    elif strategy == "sentence":
        raw = F.regexp_extract_all(text, F.lit(r"[^.!?]+[.!?]*"), 0)
    elif strategy == "semantic":
        from ..functions.assembly import let_

        # toks is let_-bound: the per-chunk lambda slices it, and an
        # unbound split expression would re-tokenize the text once per
        # chunk index (assembly.let_ lesson)
        def _windows(toks):
            n_chunks = F.ceil(
                F.size(toks) / F.lit(float(words_per_chunk))
            ).cast("int")
            idx = F.sequence(F.lit(0), F.greatest(n_chunks, F.lit(1)) - 1)
            return F.transform(
                idx,
                lambda i: F.concat_ws(
                    " ", F.slice(toks, i * words_per_chunk + 1, words_per_chunk)
                ),
            )

        return let_(F.split(F.trim(text), r"\s+"), _windows)
    else:
        raise ValueError(f"unknown chunking strategy: {strategy!r}")
    # NB: don't pass F.trim directly to transform — its optional second
    # parameter makes transform supply the element INDEX as the trim charset
    return F.filter(F.transform(raw, lambda p: F.trim(p)), lambda p: p != "")


def chunk_documents(
    docs: DataFrame,
    strategy: str = "line",
    id_col: str = "doc_id",
    text_col: str = "text",
    words_per_chunk: int = 50,
) -> DataFrame:
    """(chunk_id, doc_id, chunk_index, content) — one row per chunk.

    chunk_id = md5(doc_id ':' index): deterministic, engine-portable
    (identical md5 in the DuckDB oracle), stable under re-runs.
    """
    pieces = _pieces(F.col(text_col), strategy, words_per_chunk)
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.posexplode(pieces))
        .select(
            F.md5(
                F.concat_ws(":", F.col("doc_id").cast("string"), F.col("pos").cast("string"))
            ).alias("chunk_id"),
            "doc_id",
            F.col("pos").cast("int").alias("chunk_index"),
            F.col("col").alias("content"),
        )
    )


def hydrate_chunks(
    results: DataFrame,
    chunks: DataFrame,
    docs: DataFrame,
    snippet_len: int = 80,
) -> DataFrame:
    """J3 chunk→document hydration (roadmap :41): attach the chunk content
    snippet AND the parent document's metadata to ranked (id, score) chunk
    results. Both joins broadcast the k-row result side, so neither the
    chunk table nor the corpus shuffles."""
    c = chunks.select(
        F.col("chunk_id").alias("id"), "doc_id", "chunk_index", "content"
    )
    hydrated = c.join(F.broadcast(results), "id")
    d = docs.select("doc_id", F.col("lang").alias("doc_lang"))
    return (
        d.join(F.broadcast(hydrated), "doc_id")
        .select(
            F.col("id").alias("chunk_id"),
            "doc_id",
            "chunk_index",
            "score",
            F.substring("content", 1, snippet_len).alias("snippet"),
            "doc_lang",
        )
    )
