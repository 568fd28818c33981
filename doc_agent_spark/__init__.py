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
                    JSON salvage, text analytics, vector math)
- ``operators/``  : composite operators (extraction pipeline, dedup family,
                    similarity search, BM25/RRF search)
- ``sources/``    : table loaders
- ``sinks/``      : MERGE/upsert sink (Iceberg SQL or parquet fallback),
                    metrics + lineage appends
"""

__version__ = "0.1.0"
