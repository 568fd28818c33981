"""S2/P4 — MIME dispatch and filename projection as column expressions.

Reference: packages/extract/src/mime.ts:6-22 (extension → MIME,
case-insensitive, unknown → 'application/pdf'); providers/ollama.ts:237
(``path.split('/').pop() || 'unknown'``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..spec import MIME_TYPES


def mime_of(path: Column) -> Column:
    ext = F.lower(F.regexp_extract(path, r"(\.[^./\\]+)$", 1))
    expr = F.lit("application/pdf")
    for e, m in MIME_TYPES.items():
        expr = F.when(ext == e, F.lit(m)).otherwise(expr)
    return expr


def filename_of(path: Column) -> Column:
    last = F.element_at(F.split(path, "/"), -1)
    return F.when((last.isNull()) | (last == ""), F.lit("unknown")).otherwise(last)
