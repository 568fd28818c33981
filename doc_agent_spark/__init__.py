"""doc_agent_spark — a PySpark-native document-extraction analytics engine.

A from-scratch reimplementation of the query/data-processing capabilities of
``prosdevlab/doc-agent`` (reference snapshot at /root/reference, read-only),
re-expressed Spark-first: DataFrame/SQL plans optimized by Catalyst, with
Arrow-batched pandas UDFs only where built-in operators cannot express the
semantics (the deterministic field extractor and the Zod-exact normalizer).

Layout
------
- ``jsdate``      : bit-exact JS ``Number()`` / ``new Date()`` emulation (UTC)
- ``spec``        : the pure-Python deterministic spec (single source of truth
                    for extraction semantics; used by BOTH the Spark pipeline's
                    pandas UDFs and the test oracle)
- ``schema``      : all StructTypes (input spans table, DocumentData, metrics)
- ``corpus``      : deterministic synthetic interleaved-span corpus (seed=42)
- ``functions/``  : pure column-expression operators (assembly, mime, hashing,
                    JSON salvage, text analytics, vector math, PII redaction,
                    deterministic embedder)
- ``operators/``  : composite operators (extraction pipeline, chunking, dedup
                    family + clustering, similarity/ANN + scalar quantization,
                    BM25/RRF/rerank search, temporal joins, sampling, sketches,
                    multimodal, boilerplate, layout)
- ``sources/``    : table loaders
- ``sinks/``      : MERGE/upsert sink (schema-evolving parquet fallback,
                    Iceberg DDL builders), metrics + lineage appends
- ``streaming/``  : Structured Streaming variants (extraction, windowed
                    aggregation, sessionization, streaming dedup)
- ``api``         : named-operation service surface (MCP/REST shell analog)
"""

__version__ = "0.1.0"
