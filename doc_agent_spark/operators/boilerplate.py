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

from doc_agent_spark.functions.assembly import let_

MIN_WORDS = 6
MIN_DENSITY = 4.0        # words per line
MAX_TAG_RATIO = 0.25     # tags per word
MAX_LINK_DENSITY = 0.5   # linked words per word

# jusText (Pomikálek 2011) parameters — word-based variants of the paper's
# character thresholds so the machinery is shared with the block scorer.
JT_STOPWORDS = (
    "the", "a", "of", "and", "to", "in", "is", "on", "for", "with",
    "that", "it", "as", "this", "at", "by", "an", "be", "or", "are",
)
JT_MAX_LINK_DENSITY = 0.2
JT_LENGTH_LOW = 20       # words
JT_LENGTH_HIGH = 40      # words
JT_STOPWORDS_LOW = 0.10
JT_STOPWORDS_HIGH = 0.18


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


def _score_block(b: Column) -> Column:
    """The ONE block scorer — block_scores, block_scores_arr and
    main_island all classify through this struct, so a threshold or
    tokenizer change cannot desynchronize them."""
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


def block_scores(text: Column) -> Column:
    """array<struct<block, words, lines, density, tag_ratio, link_density,
    is_content>> — the scored block sequence (diagnostic / oracle surface)."""
    blocks = F.filter(
        F.split(text, r"\n\s*\n"), lambda b: F.trim(b) != ""
    )
    return F.transform(blocks, _score_block)


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


def _strip_clean(b: Column) -> Column:
    """Tags removed, horizontal whitespace normalized, trimmed."""
    return F.trim(
        F.regexp_replace(F.regexp_replace(b, r"<[^>]*>", " "), r"[ \t]+", " ")
    )


def justext_blocks(text: Column) -> Column:
    """jusText-style context-sensitive block classification (Pomikálek
    2011), deterministically simplified. Returns
    array<struct<block, words, cf, label>> in document order.

    Context-free pass (per block; word-count thresholds instead of the
    paper's char counts, same decision tree):
      link_density > JT_MAX_LINK_DENSITY            -> bad
      words < JT_LENGTH_LOW                         -> bad if any link else short
      stop_density >= JT_STOPWORDS_HIGH             -> good if words > JT_LENGTH_HIGH
                                                       else neargood
      stop_density >= JT_STOPWORDS_LOW              -> neargood
      otherwise                                     -> bad

    Context pass (the paper's neighborhood smoothing, simplified to
    nearest-neighbor lookups): for each short/neargood block, find the
    NEAREST context-free good/bad label on each side (document edge
    counts as bad; short/neargood neighbors are skipped):
      neargood -> good iff prev == good OR  next == good, else bad
      short    -> good iff prev == good AND next == good, else bad

    The whole thing is array expressions over the per-doc block list —
    block smoothing is doc-local, so it runs inside the scan projection
    with ZERO shuffle (the relational alternative, explode + doc-window,
    pays a full-corpus-text exchange for nothing). The neighbor scans are
    O(blocks²) on tiny per-doc arrays. DuckDB mirror in
    __spark_entry__.py shares every threshold via this module.
    """
    blocks = F.filter(F.split(text, r"\n\s*\n"), lambda b: F.trim(b) != "")

    def classify(b: Column) -> Column:
        words = _block_words(b)
        linked = _block_linked_words(b)
        link_density = F.when(
            words > 0, linked.cast("double") / words.cast("double")
        ).otherwise(F.lit(1.0))
        plain = F.regexp_replace(b, r"<[^>]*>", " ")
        toks = F.filter(F.split(plain, r"\s+"), lambda w: w != "")
        stops = F.size(
            F.filter(toks, lambda w: F.lower(w).isin(*JT_STOPWORDS))
        )
        stop_density = F.when(
            words > 0, stops.cast("double") / words.cast("double")
        ).otherwise(F.lit(0.0))
        cf = (
            F.when(link_density > JT_MAX_LINK_DENSITY, F.lit("bad"))
            .when(
                words < JT_LENGTH_LOW,
                F.when(linked > 0, F.lit("bad")).otherwise(F.lit("short")),
            )
            .when(
                stop_density >= JT_STOPWORDS_HIGH,
                F.when(words > JT_LENGTH_HIGH, F.lit("good")).otherwise(
                    F.lit("neargood")
                ),
            )
            .when(stop_density >= JT_STOPWORDS_LOW, F.lit("neargood"))
            .otherwise(F.lit("bad"))
        )
        return F.struct(b.alias("block"), words.alias("words"), cf.alias("cf"))

    # scored/cfs are let_-bound: `finalize` (a per-block lambda) references
    # cfs three times, and an unbound cfs would re-run `classify` over
    # EVERY block per block — O(blocks²) full tokenize/stopword scans (the
    # strip_repeated_page_lines disease; see assembly.let_)
    def _finalize_pass(bound: Column) -> Column:
        scored, cfs = bound["scored"], bound["cfs"]

        def finalize(s: Column, i: Column) -> Column:
            # nearest context-free good/bad on each side; edges default bad
            is_gb = lambda l: (l == "good") | (l == "bad")  # noqa: E731
            prev = F.coalesce(
                F.try_element_at(F.filter(F.slice(cfs, F.lit(1), i), is_gb), F.lit(-1)),
                F.lit("bad"),
            )
            nxt = F.coalesce(
                F.try_element_at(
                    F.filter(
                        F.slice(cfs, i + 2, F.greatest(F.size(cfs) - i - 1, F.lit(0))),
                        is_gb,
                    ),
                    F.lit(1),
                ),
                F.lit("bad"),
            )
            label = (
                F.when(is_gb(s.cf), s.cf)
                .when(
                    s.cf == "neargood",
                    F.when((prev == "good") | (nxt == "good"), F.lit("good")).otherwise(
                        F.lit("bad")
                    ),
                )
                .otherwise(  # short
                    F.when((prev == "good") & (nxt == "good"), F.lit("good")).otherwise(
                        F.lit("bad")
                    )
                )
            )
            return F.struct(
                s.block.alias("block"),
                s.words.alias("words"),
                s.cf.alias("cf"),
                label.alias("label"),
            )

        return F.transform(scored, finalize)

    scored0 = F.transform(blocks, classify)
    return let_(
        F.struct(
            scored0.alias("scored"),
            F.transform(scored0, lambda s: s.cf).alias("cfs"),
        ),
        _finalize_pass,
    )


def justext_content(text: Column) -> Column:
    """struct<content, n_good>: final-good blocks cleaned and joined."""
    labeled = justext_blocks(text)
    good = F.filter(labeled, lambda s: s.label == "good")
    return F.struct(
        F.array_join(F.transform(good, lambda s: _strip_clean(s.block)), "\n\n").alias(
            "content"
        ),
        F.size(good).alias("n_good"),
    )


def main_content(text: Column) -> Column:
    """Boilerplate-stripped main content: content blocks, tags removed,
    whitespace-normalized, joined by '\n\n'."""
    scored = block_scores(text)
    kept = F.filter(scored, lambda s: s.is_content)
    return F.array_join(
        F.transform(kept, lambda s: _strip_clean(s.block)), "\n\n"
    )


def main_island(df, text_col: str = "text", id_col: str = "doc_id"):
    """Readability-style main-cluster selection: among the ISLANDS of
    consecutive content blocks (same block classifier as ``main_content``),
    keep only the island with the largest word mass — Readability's "top
    candidate" subtree, re-expressed as gaps-and-islands (the idiom
    ``layout.table_regions`` already uses). A nav / related-links block
    between two prose runs splits them into separate islands, and the
    sidebar run loses to the article run even when each sidebar block
    individually passes the content test — the case the per-block
    classifier cannot express.

    Returns (id_col, content, n_blocks, n_islands): winning island's
    cleaned text, its block count, and how many islands competed. Docs
    with zero content blocks emit no row (caller left-joins if it needs
    them). Ties break to the earliest island.

    Scale: one explode + one doc-keyed exchange for the window pass —
    the same hash-partitioning every per-doc relational op here uses, so
    AQE coalesces and downstream per-doc joins co-locate. Group state is
    bounded by blocks-per-doc, never corpus-wide.
    """
    from pyspark.sql import Window

    blocks = F.filter(
        F.split(F.col(text_col), r"\n\s*\n"), lambda b: F.trim(b) != ""
    )
    scored = df.select(
        id_col, F.posexplode(block_scores_arr(blocks)).alias("idx", "s")
    ).filter(F.col("s.is_content"))
    grp = F.col("idx") - F.row_number().over(
        Window.partitionBy(id_col).orderBy("idx")
    )
    islands = (
        scored.withColumn("grp", grp)
        .groupBy(id_col, "grp")
        .agg(
            F.sum("s.words").alias("score"),
            F.min("idx").alias("start"),
            F.count("*").alias("n_blocks"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("idx"), F.col("s.block")))
                    ),
                    lambda x: _strip_clean(x.block),
                ),
                "\n\n",
            ).alias("content"),
        )
    )
    w = Window.partitionBy(id_col)
    ranked = islands.withColumn(
        "rnk",
        F.row_number().over(w.orderBy(F.desc("score"), F.asc("start"))),
    ).withColumn("n_islands", F.count("*").over(w))
    return ranked.filter(F.col("rnk") == 1).select(
        id_col, "content", "n_blocks", "n_islands"
    )


def block_scores_arr(blocks: Column) -> Column:
    """block_scores over a pre-split block array (same shared scorer)."""
    return F.transform(blocks, _score_block)
