"""Text-analysis functions for the training-data pipeline (task brief):
language ID (stopword heuristic), quality scoring, token counting,
document fingerprinting. All pure column expressions — JVM-side,
whole-stage-codegen'd, no Python in the hot path.

Each has a matching ANSI-SQL formulation for the DuckDB oracle (see
__spark_entry__.py), so semantics are pinned by the correctness gate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny deterministic stopword inventories (top function words per language).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "für", "auf", "ein"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est", "pour", "que"],
    "es": ["el", "la", "los", "las", "y", "de", "un", "una", "es", "para"],
}


def words_of(text: Column) -> Column:
    """Lowercased alphanumeric tokens (shared tokenizer: split on non-alnum)."""
    return F.filter(F.split(F.lower(text), r"[^a-z0-9]+"), lambda w: w != "")


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.filter(F.split(text, r"\s+"), lambda w: w != ""))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish proxy: count of word/number/punct units (GPT-style pretoken
    regex simplified to a portable, lookaround-free class so the DuckDB
    (RE2) oracle computes the identical value)."""
    return F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0)))


def stopword_hits(text: Column, lang: str) -> Column:
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(words_of(text), lambda w: F.array_contains(sw, w)))


def lang_id(text: Column) -> Column:
    """Argmax of per-language stopword hit counts; ties broken by the fixed
    language order en > de > fr > es; all-zero → 'und' (undetermined)."""
    scores = [(lang, stopword_hits(text, lang)) for lang in ("en", "de", "fr", "es")]
    best_lang = F.lit("und")
    best_score = F.lit(0)
    # forward iteration with strict > ⇒ the earliest language wins ties
    for lang, score in scores:
        better = score > best_score
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(better, score).otherwise(best_score)
    return best_lang


def quality_score(text: Column) -> Column:
    """Deterministic [0,1] quality heuristic: blend of length band, alpha
    ratio, and English-stopword ratio (training-data filter style)."""
    n = F.length(text)
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    alpha_ratio = F.when(n > 0, alpha.cast("double") / n.cast("double")).otherwise(F.lit(0.0))
    nw = token_count(text)
    sw_ratio = F.when(
        nw > 0, stopword_hits(text, "en").cast("double") / nw.cast("double")
    ).otherwise(F.lit(0.0))
    len_band = F.when((n >= 100) & (n <= 20000), F.lit(1.0)).when(n > 0, F.lit(0.5)).otherwise(F.lit(0.0))
    return F.round(len_band * 0.4 + alpha_ratio * 0.3 + F.least(sw_ratio * F.lit(4.0), F.lit(1.0)) * 0.3, 4)


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of whitespace-collapsed lowercase text."""
    return F.md5(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "))


def char_ngrams(text: Column, n: int = 3) -> Column:
    """Character n-gram shingles over the normalized text (distinct)."""
    norm = F.regexp_replace(F.lower(text), r"\s+", " ")
    idx = F.sequence(F.lit(1), F.greatest(F.length(norm) - F.lit(n - 1), F.lit(0)))
    return F.array_distinct(F.transform(idx, lambda i: F.substring(norm, i, n)))


def word_ngrams(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles (distinct), over the shared tokenizer."""
    w = words_of(text)
    idx = F.sequence(F.lit(0), F.greatest(F.size(w) - F.lit(n), F.lit(-1)))
    return F.when(F.size(w) >= n, F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(w, i + 1, n)))
    )).otherwise(F.array())
