"""Locale-aware monetary amount parsing — the F-family extraction step
the reference delegates to the vision model's string output (its spec
then only safeNumber-coerces, packages/shared/src/normalize.ts): real
invoices carry '$1,234.56', '1.234,56 €', "CHF 1'234.50", '(2,500.00)'
accounting negatives, and bare '-1234,75' — a parser has to decide which
separator is the decimal point per string.

Rules (deterministic, pure column expressions, no lookaround — the
DuckDB/RE2 mirror in __spark_entry__.py is the same algebra):

1. currency: $ / € / £ symbols map to ISO codes; else the first ISO code
   token (USD|EUR|GBP|CHF|JPY) in the string; else ''.
2. sign: parentheses around the number (accounting style) or a '-'
   immediately preceding digits -> negative.
3. numeric run: the first maximal [0-9][0-9.,' ]*[0-9] run; spaces and
   apostrophes (Swiss thousands) are dropped.
4. separator disambiguation on the cleaned token t:
   - both '.' and ',' present: the LAST-occurring separator is the
     decimal point, the other is thousands ('1.234,56' vs '1,234.56');
   - a single ',' (or '.') followed by 1-2 trailing digits: decimal;
   - otherwise every ',' / '.' is a thousands separator ('1,234' ->
     1234 — the standard resolution of the ambiguous case).
5. amount = signed double rounded to 2 (cents-exact for the formats
   above); NULL when the string holds no digits.

Zero-shuffle scan projection; whole-stage codegen throughout.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_ISO = r"\b(USD|EUR|GBP|CHF|JPY)\b"


def currency_of(c: Column) -> Column:
    return (
        F.when(c.contains("$"), F.lit("USD"))
        .when(c.contains("€"), F.lit("EUR"))
        .when(c.contains("£"), F.lit("GBP"))
        .otherwise(F.regexp_extract(c, _ISO, 1))
    )


_AMT = (
    r"((?:[0-9]{1,3}(?:[ .,'][0-9]{3})+(?:[.,][0-9]{1,2})?)"
    r"|(?:[0-9]+(?:[.,][0-9]+)*))"
)
# prefix guard: the minus counts as a sign only when it is NOT glued to an
# identifier ('INV-2024' keeps its positive 2024); spaces-as-thousands are
# only eaten in 3-digit groups, so 'rooms 2, 3' cannot fuse into '2,3'
_SIGNED = r"(^|[^0-9A-Za-z])(-?)[ ]?" + _AMT


def parse_amount(c: Column) -> Column:
    """struct<amount: double, currency: string> per the module rules.

    Contract: the FIRST well-formed numeric run is the amount — callers
    hand this the amount field/cell, not a free-text sentence (a leading
    date or id number would win; that disambiguation is the extractor
    spec's job, not the parser's).
    """
    neg = c.rlike(r"\([^)]*[0-9][^)]*\)") | (
        F.regexp_extract(c, _SIGNED, 2) == "-"
    )
    tok = F.regexp_extract(c, _SIGNED, 3)
    t = F.regexp_replace(tok, r"[ ']", "")
    # tail length after the LAST occurrence: greedy ^.* eats through it
    comma_tail = F.length(F.regexp_replace(t, r"^.*,", ""))
    dot_tail = F.length(F.regexp_replace(t, r"^.*\.", ""))
    both = t.contains(".") & t.contains(",")
    t2 = (
        F.when(
            both & (comma_tail < dot_tail),
            F.regexp_replace(F.regexp_replace(t, r"\.", ""), ",", "."),
        )
        .when(both, F.regexp_replace(t, ",", ""))
        .when(t.rlike(r"^[0-9]+,[0-9]{1,2}$"), F.regexp_replace(t, ",", "."))
        .when(t.contains(","), F.regexp_replace(t, ",", ""))
        .when(t.rlike(r"^[0-9]+\.[0-9]{1,2}$"), t)
        .when(t.contains("."), F.regexp_replace(t, r"\.", ""))
        .otherwise(t)
    )
    amount = F.when(t2 == "", F.lit(None).cast("double")).otherwise(
        F.round(
            t2.cast("double") * F.when(neg, F.lit(-1.0)).otherwise(F.lit(1.0)), 2
        )
    )
    return F.struct(amount.alias("amount"), currency_of(c).alias("currency"))


def parse_amount_sql(expr: str) -> str:
    """DuckDB mirror over a string expression — identical rule algebra;
    emits ``{amount, currency}``."""
    signed = _SIGNED.replace("'", "''")
    tok = f"regexp_extract({expr}, '{signed}', 3)"
    t = f"regexp_replace({tok}, '[ '']', '', 'g')"
    comma_tail = f"length(regexp_replace({t}, '^.*,', ''))"
    dot_tail = f"length(regexp_replace({t}, '^.*\\.', ''))"
    both = f"(contains({t}, '.') AND contains({t}, ','))"
    t2 = f"""
CASE
  WHEN {both} AND {comma_tail} < {dot_tail}
    THEN replace(replace({t}, '.', ''), ',', '.')
  WHEN {both} THEN replace({t}, ',', '')
  WHEN regexp_matches({t}, '^[0-9]+,[0-9]{{1,2}}$')
    THEN replace({t}, ',', '.')
  WHEN contains({t}, ',') THEN replace({t}, ',', '')
  WHEN regexp_matches({t}, '^[0-9]+\\.[0-9]{{1,2}}$') THEN {t}
  WHEN contains({t}, '.') THEN replace({t}, '.', '')
  ELSE {t}
END""".strip()
    neg = (
        f"(regexp_matches({expr}, '\\([^)]*[0-9][^)]*\\)')"
        f" OR regexp_extract({expr}, '{signed}', 2) = '-')"
    )
    amount = (
        f"CASE WHEN ({t2}) = '' THEN NULL "
        f"ELSE round(CAST(({t2}) AS DOUBLE) * (CASE WHEN {neg} THEN -1.0 ELSE 1.0 END), 2) END"
    )
    cur = (
        f"CASE WHEN contains({expr}, '$') THEN 'USD' "
        f"WHEN contains({expr}, '€') THEN 'EUR' "
        f"WHEN contains({expr}, '£') THEN 'GBP' "
        f"ELSE coalesce(regexp_extract({expr}, '\\b(USD|EUR|GBP|CHF|JPY)\\b', 1), '') END"
    )
    return f"{{'amount': {amount}, 'currency': {cur}}}"
