"""PII redaction for training-data pipelines — pure column expressions.

A standard pre-training scrub: emails, phone-like digit runs, SSN-shaped
ids, and long account-number digit runs replaced with typed placeholder
tokens. Patterns are written in the RE2-compatible subset (no lookarounds,
no backreferences) so Spark (Java regex) and the DuckDB oracle (RE2)
execute the identical automaton; replacements apply globally and in a
fixed order (most-specific first) so the output is engine-portable.

At 100 TB this is a zero-shuffle projection inside the scan stage —
whole-stage-codegen'd regexp_replace chains, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ordered: specific → general, so e.g. SSNs don't get half-eaten by the
# phone pattern first. (pattern, replacement) applied as a chain.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (r"\b\d{10,}\b", "<ACCT>"),
    (r"\+?\d[\d().\- ]{7,}\d", "<PHONE>"),
)


def redact_pii(text: Column) -> Column:
    out = text
    for pat, rep in PII_PATTERNS:
        out = F.regexp_replace(out, pat, rep)
    return out


def pii_counts(text: Column) -> Column:
    """struct of per-category match counts (audit metric for the scrub)."""
    fields = []
    remaining = text
    for (pat, rep), name in zip(PII_PATTERNS, ("emails", "ssns", "accts", "phones")):
        fields.append(F.size(F.regexp_extract_all(remaining, F.lit(pat), F.lit(0))).alias(name))
        remaining = F.regexp_replace(remaining, pat, rep)
    return F.struct(*fields)


def redact_sql(col: str) -> str:
    """The DuckDB mirror of :func:`redact_pii` over column expression
    ``col`` (same patterns, same order, global replace)."""
    out = col
    for pat, rep in PII_PATTERNS:
        p = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{rep}', 'g')"
    return out
