"""F12/F13 — path hashing and deterministic ids as column expressions.

Reference: packages/storage/src/index.ts:17-20 (sha256 of resolved path);
ollama.ts:236 randomUUID → replaced with a content-derived id (SURVEY F13)
so fixtures are reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def path_hash(canonical_path: Column) -> Column:
    return F.sha2(canonical_path, 256)


def deterministic_id(doc_id: Column) -> Column:
    return F.sha2(F.concat(doc_id, F.lit(":extraction")), 256)


def content_hash(text: Column) -> Column:
    return F.sha2(F.coalesce(text, F.lit("")), 256)
