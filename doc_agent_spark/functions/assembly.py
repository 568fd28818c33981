"""S5/P1/W2 — page-text assembly as pure column expressions.

Reference: packages/extract/src/ocr.ts:46,57-61 —
1-based page numbers assigned BEFORE filtering, whitespace-only pages
dropped, ``--- Page N ---\\n{trim(text)}`` joined with ``\\n\\n``.

Everything here stays inside whole-stage codegen (no Python): array_sort
with an offset comparator (order comes from DATA, never partition order),
transform-with-index, filter, array_join.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sorted_spans(spans: Column) -> Column:
    """Sort the span array by ``offset`` (W2: deterministic document order)."""
    return F.array_sort(
        spans,
        lambda a, b: F.when(a.offset < b.offset, F.lit(-1))
        .when(a.offset > b.offset, F.lit(1))
        .otherwise(F.lit(0)),
    )


def _ws_trim(c: Column) -> Column:
    """JS String.trim() semantics (all whitespace, not just spaces —
    F.trim only strips 0x20)."""
    return F.regexp_replace(F.regexp_replace(c, r"^\s+", ""), r"\s+$", "")


def assemble_page_text(spans: Column) -> Column:
    """Assembled OCR-text equivalent for a ``spans`` array column.

    Page number = 1-based position in offset order (before filtering),
    mirroring ocr.ts page indexing.
    """
    numbered = F.transform(
        sorted_spans(spans),
        lambda s, i: F.struct(
            (i + F.lit(1)).alias("page"),
            _ws_trim(F.coalesce(s.text, F.lit(""))).alias("t"),
        ),
    )
    kept = F.filter(numbered, lambda p: p.t != "")
    rendered = F.transform(
        kept, lambda p: F.concat(F.lit("--- Page "), p.page.cast("string"), F.lit(" ---\n"), p.t)
    )
    return F.array_join(rendered, "\n\n")


def assemble_pages_array(pages: Column) -> Column:
    """Same semantics over a plain ``array<string>`` of page texts."""
    numbered = F.transform(
        pages,
        lambda t, i: F.struct(
            (i + F.lit(1)).alias("page"),
            _ws_trim(F.coalesce(t, F.lit(""))).alias("t"),
        ),
    )
    kept = F.filter(numbered, lambda p: p.t != "")
    rendered = F.transform(
        kept, lambda p: F.concat(F.lit("--- Page "), p.page.cast("string"), F.lit(" ---\n"), p.t)
    )
    return F.array_join(rendered, "\n\n")
