"""Boilerplate stripping via block scoring — Readability/Boilerpipe-style
text-density + tag-ratio heuristics (north_star: "boilerplate stripping via
text-density and tag-ratio heuristics (Readability/Boilerpipe-style block
scoring)"; the reference's equivalent knob is the prompt's "extract the
main content" instruction, providers/ollama.ts:85-89).

Model (a deterministic simplification of Boilerpipe's NumWordsRules
classifier + Readability's link-density test):
- a document is split into BLOCKS on blank lines;
- per block: word count, line count, text density (words per line),
  tag ratio (markup chars '<tag>' per word), link density (words inside
  <a>…</a> per word);
- a block is CONTENT iff words >= min_words AND density >= min_density
  AND tag_ratio <= max_tag_ratio AND link_density <= max_link_density;
- output = content blocks joined by '\n\n', tags stripped.

Everything is pure column expressions (JVM, codegen, zero Python) and has a
1:1 DuckDB formulation in __spark_entry__.py, so the semantics sit under the
oracle gate. At 100 TB this runs inside the scan projection — no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MIN_WORDS = 6
MIN_DENSITY = 4.0        # words per line
MAX_TAG_RATIO = 0.25     # tags per word
MAX_LINK_DENSITY = 0.5   # linked words per word


def _block_words(b: Column) -> Column:
    plain = F.regexp_replace(b, r"<[^>]*>", " ")
    return F.size(F.filter(F.split(plain, r"\s+"), lambda w: w != ""))


def _block_lines(b: Column) -> Column:
    return F.greatest(
        F.size(F.filter(F.split(b, r"\n"), lambda ln: F.trim(ln) != "")), F.lit(1)
    )


def _block_tags(b: Column) -> Column:
    return F.size(F.regexp_extract_all(b, F.lit(r"<[^>]*>"), F.lit(0)))


def _block_linked_words(b: Column) -> Column:
    linked = F.array_join(
        F.regexp_extract_all(b, F.lit(r"(?s)<a\b[^>]*>(.*?)</a>"), F.lit(1)), " "
    )
    return F.size(F.filter(F.split(linked, r"\s+"), lambda w: w != ""))


def block_scores(text: Column) -> Column:
    """array<struct<block, words, lines, density, tag_ratio, link_density,
    is_content>> — the scored block sequence (diagnostic / oracle surface)."""
    blocks = F.filter(
        F.split(text, r"\n\s*\n"), lambda b: F.trim(b) != ""
    )

    def score(b: Column):
        words = _block_words(b)
        lines = _block_lines(b)
        tags = _block_tags(b)
        linked = _block_linked_words(b)
        density = words.cast("double") / lines.cast("double")
        tag_ratio = F.when(words > 0, tags.cast("double") / words.cast("double")).otherwise(F.lit(1.0))
        link_density = F.when(words > 0, linked.cast("double") / words.cast("double")).otherwise(F.lit(1.0))
        return F.struct(
            b.alias("block"),
            words.alias("words"),
            lines.alias("lines"),
            F.round(density, 4).alias("density"),
            F.round(tag_ratio, 4).alias("tag_ratio"),
            F.round(link_density, 4).alias("link_density"),
            (
                (words >= MIN_WORDS)
                & (density >= MIN_DENSITY)
                & (tag_ratio <= MAX_TAG_RATIO)
                & (link_density <= MAX_LINK_DENSITY)
            ).alias("is_content"),
        )

    return F.transform(blocks, score)


def dom_tokens(text: Column) -> Column:
    """Batched DOM tokenization (north_star "batched DOM/byte-stream
    tokenization"): the markup stream as an ordered token sequence
    array<struct<kind,'tag'|'text', token:string>> — tags kept verbatim
    (lowercased name form preserved by the consumer), text runs trimmed,
    whitespace-only runs dropped. One regexp scan, vectorized JVM-side."""
    raw = F.regexp_extract_all(text, F.lit(r"(<[^>]*>|[^<]+)"), F.lit(1))
    toks = F.transform(
        raw,
        lambda t: F.struct(
            F.when(t.startswith("<"), F.lit("tag")).otherwise(F.lit("text")).alias("kind"),
            F.when(t.startswith("<"), t).otherwise(F.trim(t)).alias("token"),
        ),
    )
    return F.filter(toks, lambda s: s.token != "")


def main_content(text: Column) -> Column:
    """Boilerplate-stripped main content: content blocks, tags removed,
    whitespace-normalized, joined by '\n\n'."""
    scored = block_scores(text)
    kept = F.filter(scored, lambda s: s.is_content)
    clean = F.transform(
        kept,
        lambda s: F.trim(F.regexp_replace(F.regexp_replace(s.block, r"<[^>]*>", " "), r"[ \t]+", " ")),
    )
    return F.array_join(clean, "\n\n")
