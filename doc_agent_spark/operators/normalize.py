"""F1–F9 — the Zod-exact normalization layer as an Arrow-batched UDF.

Reference: packages/extract/src/schemas.ts:8-98. The JS coercion edge cases
(``Number('') === 0``, ``??`` vs ``||``, V8 date parsing) cannot be expressed
by SQL casts (SURVEY §7.3), so the exact path is a pandas UDF over raw JSON
strings calling ``spec.normalize_docdata``; parse/validation failures become
NULL structs + a parse_failure flag (never exceptions — ollama.ts's
retry-then-throw becomes a metric, north_star).

For inputs already field-split (no JS-string coercion needed), the pure-expr
fast path ``normalize_exprs`` keeps everything in codegen.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BooleanType, DoubleType, StringType, StructField, StructType,
)

from .. import spec
from ..schema import LINE_ITEM

NORMALIZED = StructType([
    StructField("type", StringType(), True),
    StructField("vendor", StringType(), True),
    StructField("amount", DoubleType(), True),
    StructField("date", StringType(), True),
    StructField("date_raw", StringType(), True),
    StructField("items", ArrayType(LINE_ITEM), True),
    StructField("raw_text", StringType(), True),
    StructField("parse_failure", BooleanType(), False),
])


def _normalize_one(raw: str | None) -> dict:
    base = {"type": None, "vendor": None, "amount": None, "date": None,
            "date_raw": None, "items": None, "raw_text": None,
            "parse_failure": True}
    if raw is None:
        return base
    try:
        parsed = spec.salvage_parse(spec.strip_fences(raw))
        norm = spec.normalize_docdata(parsed)
    except spec.ZodParseError:
        return base
    norm = dict(norm)
    norm["parse_failure"] = False
    return norm


def normalize_json_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = [_normalize_one(r) for r in pdf["raw_json"]]
        res = pd.DataFrame(out, columns=[f.name for f in NORMALIZED.fields])
        res.insert(0, "case_id", pdf["case_id"].values)
        yield res


def normalize_json(df: DataFrame) -> DataFrame:
    """(case_id, raw_json) → (case_id, <NORMALIZED fields>)."""
    out_schema = StructType(
        [StructField("case_id", StringType(), True)] + list(NORMALIZED.fields)
    )
    return df.select("case_id", "raw_json").mapInPandas(normalize_json_batch, out_schema)


def doc_type_normalize(col: Column) -> Column:
    """F6 expr fast path: enum else 'other' (schemas.ts:71)."""
    return F.when(
        col.isin("invoice", "receipt", "bank_statement", "other"), col
    ).otherwise(F.lit("other"))


def vendor_coalesce(vendor: Column, store_name: Column, merchant: Column, business_name: Column) -> Column:
    """F7 expr fast path (schemas.ts:91) — nullish chain."""
    return F.coalesce(vendor, store_name, merchant, business_name)


def amount_coalesce(amount: Column, total: Column, total_amount: Column) -> Column:
    """F8 expr fast path (schemas.ts:92) over already-numeric columns."""
    return F.coalesce(amount, total, total_amount)


def description_coalesce(description: Column, name: Column, item: Column) -> Column:
    """F2 expr fast path — FALSY skip: empty strings skipped (schemas.ts:30)."""
    def nz(c: Column) -> Column:
        return F.nullif(c, F.lit(""))
    return F.coalesce(nz(description), nz(name), nz(item), F.lit("Unknown item"))
