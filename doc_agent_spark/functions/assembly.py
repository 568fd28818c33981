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


def reflow_text(c: Column) -> Column:
    """PDF/OCR text reflow: de-hyphenate words broken across line ends,
    join soft-wrapped lines, collapse the residual double spaces.

    Rules (applied in order, one global regexp pass each; no lookaround so
    the DuckDB/RE2 oracle mirror is byte-identical):
      1. ``letter-\\n lowercase`` -> the two word halves rejoined (the
         standard dehyphenation heuristic: only fuse when the continuation
         starts lowercase, so real hyphenated compounds before a proper
         noun survive);
      2. a newline NOT preceded by terminal punctuation (.!?:;) and NOT
         followed by a blank line -> space (soft wrap), paragraph breaks
         (blank lines) preserved;
      3. runs of horizontal whitespace -> one space.

    Zero-shuffle scan projection; left-to-right global-replace semantics
    are identical in Java regex and RE2.
    """
    x = F.regexp_replace(c, r"([A-Za-z])-\n([a-z])", "$1$2")
    # two passes: the global replace consumes the char after each joined
    # newline, so a ONE-character wrapped line ('x\n1\ny') leaves its own
    # trailing newline unjoined on pass one; the second pass catches it
    # (longer alternating chains are pathological, not practical text)
    x = F.regexp_replace(x, r"([^.!?:;\n])\n([^\n])", "$1 $2")
    x = F.regexp_replace(x, r"([^.!?:;\n])\n([^\n])", "$1 $2")
    return F.regexp_replace(x, r"[ \t]{2,}", " ")


def _digit_norm(line: Column) -> Column:
    return F.regexp_replace(line, r"\d+", "#")


def let_(value: Column, body) -> Column:
    """Expression-level let-binding: evaluate ``value`` ONCE per row and
    feed it to ``body`` as a bound lambda variable, via a single-element
    ``transform``. Higher-order lambdas re-evaluate every captured outer
    EXPRESSION once per element (the winnowing/page-repair lesson — a
    nested transform chain re-split every page per page, 25x the work);
    a lambda VARIABLE is a cheap slot read. Use this whenever a lambda
    body must reference a non-trivial outer expression."""
    return F.get(F.transform(F.array(value), body), 0)


def strip_repeated_page_lines(pages: Column, min_pages: int = 3) -> Column:
    """Cross-page header/footer removal: drop a page's FIRST line when the
    same (digit-normalized) line opens >= ``min_pages`` of the document's
    pages, and its LAST line when the normalized line closes >=
    ``min_pages`` pages. Digit normalization (every digit run -> '#')
    matches 'Page 1 of 3' with 'Page 2 of 3' — the canonical running-
    footer case a literal comparison misses.

    Returns struct<pages: array<string>, removed: int>. Doc-local array
    algebra: the repeat counts compare each page against its own
    document's pages only, inside the scan projection — no shuffle, no
    corpus-wide state (contrast ``dedup.line_dups``, the cross-document
    boilerplate-line pass).
    """
    # Every cross-page aggregate (lines, firsts, lasts) is let_-bound so
    # the per-page lambda reads a slot instead of re-splitting every
    # page's text per page (the un-bound form measured ~25x slower —
    # 9.8 s vs 0.4 s warm at sf0.1).
    def _with_lines(lines: Column) -> Column:
        def _with_firsts_lasts(fl: Column) -> Column:
            firsts, lasts = fl["firsts"], fl["lasts"]

            def strip_page(ls: Column) -> Column:
                hdr_rep = (
                    F.size(
                        F.filter(firsts, lambda x: x == _digit_norm(F.get(ls, 0)))
                    )
                    >= min_pages
                )
                after_hdr = F.when(
                    hdr_rep, F.slice(ls, 2, F.greatest(F.size(ls) - 1, F.lit(0)))
                ).otherwise(ls)
                last_line = F.try_element_at(after_hdr, F.size(after_hdr))
                ftr_rep = (F.size(after_hdr) > 0) & (
                    F.size(F.filter(lasts, lambda x: x == _digit_norm(last_line)))
                    >= min_pages
                )
                return F.when(
                    ftr_rep,
                    F.slice(
                        after_hdr, 1, F.greatest(F.size(after_hdr) - 1, F.lit(0))
                    ),
                ).otherwise(after_hdr)

            # kept LINE ARRAYS, not joined strings: the removed metric diffs
            # the flattened array sizes, so a page that was already '' on
            # input (one empty line in, one out) counts zero — re-splitting
            # joined strings would miscount it, since split('') is [''].
            def _with_kept(kept: Column) -> Column:
                removed = F.size(F.flatten(lines)) - F.size(F.flatten(kept))
                pages_out = F.transform(kept, lambda a: F.array_join(a, "\n"))
                return F.struct(
                    pages_out.alias("pages"), removed.cast("int").alias("removed")
                )

            return let_(F.transform(lines, strip_page), _with_kept)

        return let_(
            F.struct(
                F.transform(
                    lines, lambda ls: _digit_norm(F.get(ls, 0))
                ).alias("firsts"),
                F.transform(
                    lines, lambda ls: _digit_norm(F.element_at(ls, F.size(ls)))
                ).alias("lasts"),
            ),
            _with_firsts_lasts,
        )

    return let_(
        F.transform(pages, lambda p: F.split(p, r"\n")), _with_lines
    )
