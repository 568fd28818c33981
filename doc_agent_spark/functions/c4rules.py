"""C4 rule-based page cleaning (Raffel et al. 2020 §2.2) — the classic
heuristic line/page filter every web-corpus pipeline starts from, distinct
from the FREQUENCY-based boilerplate-line strip (operators/dedup.py
line_dups): these rules need no corpus statistic at all, so they run as a
zero-shuffle projection on every row (scan-side at 100 TB, before anything
that shuffles).

Pinned rules (mirrored 1:1 by the ``*_sql`` builders for the DuckDB
oracle):

line KEPT iff (trimmed):
- non-empty and ends in a terminal punctuation mark (``[.!?"']``);
- has ≥ 5 words (the repo's shared ``words_of`` tokenizer);
- does not contain ``javascript`` (case-insensitive).

page PASS iff:
- the RAW page contains neither ``lorem ipsum`` (case-insensitive) nor a
  curly brace ``{`` (C4 drops such pages outright, so the flags look at
  the raw text — a dropped line doesn't un-flag the page);
- the CLEANED text has ≥ 3 sentences, counted as terminal-mark characters
  (``[.!?]``) — a deliberate, documented simplification of C4's sentence
  split that is RE2-portable (DuckDB's regex engine has no lookbehind).

The reference has no web-cleaning stage (it OCRs scanned documents —
packages/extract/src/ocr.ts); this belongs to the corpus-curation layer,
beside the Gopher battery (functions/gopher.py) and the bad-words filter
(functions/textfns.py blocklist_hits).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from doc_agent_spark.functions.textfns import words_of

_TERMINAL_RE = "[.!?\"']$"
MIN_LINE_WORDS = 5
MIN_SENTENCES = 3


def _line_kept(t: Column) -> Column:
    return (
        (t != "")
        & t.rlike(_TERMINAL_RE)
        & (F.size(words_of(t)) >= MIN_LINE_WORDS)
        & ~F.contains(F.lower(t), F.lit("javascript"))
    )


def c4_clean(text: Column) -> Column:
    """The cleaned page: kept lines re-joined with newlines."""
    # NOT transform(arr, F.trim): higher-order functions call a two-arg
    # callable with (element, index), and F.trim's optional second arg is
    # the trim-CHARACTER set — the index silently becomes that set and
    # nothing is trimmed. The unary lambda pins the one-arg form.
    lines = F.transform(F.split(text, "\n"), lambda l: F.trim(l))
    return F.array_join(F.filter(lines, _line_kept), "\n")


def n_sentences(clean: Column) -> Column:
    """Terminal-mark count over the cleaned text (the portable sentence
    proxy — see module docstring)."""
    return F.length(F.regexp_replace(clean, "[^.!?]", ""))


def c4_page_pass(raw: Column, clean: Column) -> Column:
    return (
        ~F.contains(F.lower(raw), F.lit("lorem ipsum"))
        & ~F.contains(raw, F.lit("{"))
        & (n_sentences(clean) >= MIN_SENTENCES)
    )


# --- DuckDB mirrors -------------------------------------------------------

_WORDS_LINE_SQL = (
    "list_filter(string_split_regex(lower(l), '[^a-z0-9]+'), w -> w <> '')"
)


def c4_clean_sql(text_expr: str) -> str:
    return (
        "array_to_string(list_filter(list_transform(string_split("
        f"{text_expr}, chr(10)), l -> trim(l)), "
        "l -> l <> '' AND regexp_matches(l, '[.!?\"'']$') "
        f"AND len({_WORDS_LINE_SQL}) >= {MIN_LINE_WORDS} "
        "AND NOT contains(lower(l), 'javascript')), chr(10))"
    )


def n_sentences_sql(clean_expr: str) -> str:
    return f"length(regexp_replace({clean_expr}, '[^.!?]', '', 'g'))"


def c4_page_pass_sql(raw_expr: str, clean_expr: str) -> str:
    return (
        f"(NOT contains(lower({raw_expr}), 'lorem ipsum') "
        f"AND NOT contains({raw_expr}, '{{') "
        f"AND {n_sentences_sql(clean_expr)} >= {MIN_SENTENCES})"
    )
