"""Golden tests: boilerplate block scoring and line/column-run layout
segmentation (north_star capabilities; pure-expression operators)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from doc_agent_spark.operators import boilerplate, layout

HTML_DOC = (
    "<nav><a href=/>Home</a> | <a href=/about>About</a> | <a href=/contact>Contact</a></nav>\n"
    "\n"
    "The quick brown fox jumps over the lazy dog near the river bank today.\n"
    "It was a bright cold day in April and the clocks were striking thirteen loudly.\n"
    "\n"
    "<footer>© 2024 Example Corp <a href=/terms>Terms</a></footer>\n"
    "\n"
    "Short.\n"
)


def test_block_scoring_keeps_prose_drops_nav(spark):
    df = spark.createDataFrame([(1, HTML_DOC)], "id long, text string")
    rows = df.select(boilerplate.block_scores(F.col("text")).alias("b")).collect()[0].b
    assert len(rows) == 4
    nav, prose, footer, short = rows
    assert not nav.is_content            # high link density + tag ratio
    assert prose.is_content              # dense prose
    assert not footer.is_content
    assert not short.is_content          # below min words
    assert prose.words == 29 and prose.lines == 2


def test_main_content_strips_tags_and_boilerplate(spark):
    df = spark.createDataFrame([(1, HTML_DOC)], "id long, text string")
    got = df.select(boilerplate.main_content(F.col("text")).alias("m")).collect()[0].m
    assert "Home" not in got and "<" not in got and "©" not in got
    assert got.startswith("The quick brown fox")
    assert "striking thirteen loudly." in got


def test_main_content_empty_for_pure_boilerplate(spark):
    df = spark.createDataFrame(
        [(1, "<nav><a href=/>Home</a></nav>\n\n<footer>x</footer>")],
        "id long, text string",
    )
    assert df.select(boilerplate.main_content(F.col("text")).alias("m")).collect()[0].m == ""


def test_dom_tokens_stream(spark):
    df = spark.createDataFrame(
        [(1, '<div class="x">Hello <b>world</b>!</div>  ')], "id long, text string"
    )
    toks = df.select(boilerplate.dom_tokens(F.col("text")).alias("t")).collect()[0].t
    assert [(t.kind, t.token) for t in toks] == [
        ("tag", '<div class="x">'),
        ("text", "Hello"),
        ("tag", "<b>"),
        ("text", "world"),
        ("tag", "</b>"),
        ("text", "!"),
        ("tag", "</div>"),
    ]


LAYOUT_DOC = (
    "INVOICE            ACME CORP\n"
    "Item     Qty       Price\n"
    "Widget   2         10.00\n"
    "single space line only\n"
)


def test_line_column_runs_offsets(spark):
    df = spark.createDataFrame([(7, LAYOUT_DOC)], "doc_id long, text string")
    runs = layout.line_column_runs(df).collect()
    by_line = {}
    for r in runs:
        by_line.setdefault(r.line_no, []).append((r.run_idx, r.col_start, r.run_text))
    assert by_line[0] == [(0, 0, "INVOICE"), (1, 19, "ACME CORP")]
    assert by_line[1] == [(0, 0, "Item"), (1, 9, "Qty"), (2, 19, "Price")]
    assert by_line[2] == [(0, 0, "Widget"), (1, 9, "2"), (2, 19, "10.00")]
    # single interior spaces do NOT split a run
    assert by_line[3] == [(0, 0, "single space line only")]
    # offsets are true character positions
    for line_no, rs in by_line.items():
        src = LAYOUT_DOC.split("\n")[line_no]
        for _idx, start, txt in rs:
            assert src[start:start + len(txt)] == txt


def test_column_profile_detects_aligned_columns(spark):
    df = spark.createDataFrame([(7, LAYOUT_DOC)], "doc_id long, text string")
    prof = {
        r.col_start: r.n_lines
        for r in layout.column_profile(layout.line_column_runs(df)).collect()
    }
    # columns at 0 (all 4 lines), 9 (2 lines), 19 (3 lines)
    assert prof[0] == 4 and prof[9] == 2 and prof[19] == 3


def test_layout_runs_leading_gap(spark):
    df = spark.createDataFrame([(1, "   indented   x")], "doc_id long, text string")
    runs = [(r.col_start, r.run_text) for r in layout.line_column_runs(df).collect()]
    assert runs == [(3, "indented"), (14, "x")]


def test_table_regions_finds_aligned_block(spark):
    """A fixed-pitch 3-row block is one table; the interrupting line breaks
    a would-be 4-row island into the 3-row block only; 1-run lines and
    unique-signature lines never form tables."""
    page = "\n".join([
        "INVOICE",                                # line 0: 1 run
        "item      qty   price",                  # 1: table row (0,10,16)
        "apples    3     1.50",                   # 2: same sig
        "pears     12    0.75",                   # 3: same sig
        "thanks for your business",               # 4: 1 run (single spaces)
        "total     99.99",                        # 5: (0,10) — alone
    ])
    df = spark.createDataFrame([(7, page)], "doc_id long, text string")
    runs = layout.line_column_runs(df)
    got = layout.table_regions(runs).collect()
    assert len(got) == 1
    t = got[0]
    assert (t.start_line, t.end_line, t.n_rows, t.n_cols) == (1, 3, 3, 3)
    assert t.sig == "0,10,16"


def test_table_regions_interrupted_signature_splits_islands(spark):
    page = "\n".join([
        "a         b",       # sig 0,10
        "c         d",       # sig 0,10
        "an interrupting prose line with single spaces only",
        "e         f",       # sig 0,10 again — new island, height 1 < 2
    ])
    df = spark.createDataFrame([(1, page)], "doc_id long, text string")
    got = layout.table_regions(layout.line_column_runs(df)).collect()
    assert len(got) == 1
    assert (got[0].start_line, got[0].end_line) == (0, 1)


def test_table_regions_respects_min_cols(spark):
    page = "a         b\nc         d"
    df = spark.createDataFrame([(1, page)], "doc_id long, text string")
    assert layout.table_regions(
        layout.line_column_runs(df), min_cols=3
    ).count() == 0


def test_table_cells_grid(spark):
    page = "\n".join([
        "item      qty   price",
        "apples    3     1.50",
    ])
    df = spark.createDataFrame([(1, page)], "doc_id long, text string")
    runs = layout.line_column_runs(df)
    cells = layout.table_cells(runs, layout.table_regions(runs)).collect()
    grid = {(c.row_idx, c.col_idx): c.cell for c in cells}
    assert grid == {
        (0, 0): "item", (0, 1): "qty", (0, 2): "price",
        (1, 0): "apples", (1, 1): "3", (1, 2): "1.50",
    }


# --- jusText context-sensitive classification + island selection ---------

NAV = "<a href=/>Home</a> <a href=/about>About</a>"
# 47 words, 23 stopwords (0.489 >= STOPWORDS_HIGH), > LENGTH_HIGH -> good
PROSE = (
    "it is a truth universally acknowledged that a single man in possession "
    "of a good fortune must be in want of a wife and this truth is so well "
    "fixed in the minds of the surrounding families that he is considered "
    "the rightful property of their daughters"
)
# 23 words, 4 stopwords (0.174 in [LOW, HIGH)) -> neargood
SUMMARY = (
    "the committee reviewed quarterly metrics and approved the revised "
    "budget for continued operations across all regional divisions pending "
    "final signatures from senior leadership"
)
SHORT = "Thanks for reading today."
FOOTER = "<footer>(c) 2024 <a href=/terms>Terms</a> all rights reserved</footer>"


def _justext_labels(spark, page):
    df = spark.createDataFrame([(1, page)], "id long, text string")
    rows = df.select(boilerplate.justext_blocks(F.col("text")).alias("b")).collect()[0].b
    return [(r.cf, r.label) for r in rows]


def test_justext_context_free_and_smoothing(spark):
    page = "\n\n".join([NAV, PROSE, SUMMARY, SHORT, FOOTER])
    got = _justext_labels(spark, page)
    assert got == [
        ("bad", "bad"),            # nav: link density 1.0
        ("good", "good"),          # long stopword-dense prose
        ("neargood", "good"),      # promoted: nearest gb neighbor (prose) good
        ("short", "bad"),          # next gb neighbor is the bad footer
        ("bad", "bad"),            # footer: linked words + below length_low
    ]


def test_justext_short_between_goods_promoted(spark):
    page = "\n\n".join([PROSE, "A brief aside here.", PROSE])
    got = _justext_labels(spark, page)
    assert got == [("good", "good"), ("short", "good"), ("good", "good")]


def test_justext_neargood_without_good_neighbor_demoted(spark):
    got = _justext_labels(spark, SUMMARY)
    assert got == [("neargood", "bad")]


def test_justext_content_joins_good_blocks(spark):
    page = "\n\n".join([NAV, PROSE, SUMMARY, SHORT, FOOTER])
    df = spark.createDataFrame([(1, page)], "id long, text string")
    row = df.select(boilerplate.justext_content(F.col("text")).alias("m")).collect()[0].m
    assert row.n_good == 2
    assert row.content.startswith("it is a truth")
    assert "senior leadership" in row.content
    assert "Home" not in row.content and "Terms" not in row.content


P1 = "alpha beta gamma delta epsilon zeta eta"            # 7 words, content
P2 = "one two three four five six"                        # 6 words, content
BOIL = "<a href=/x>More links here</a>"                    # link density 1.0
P3_BIG = " ".join(f"w{i}" for i in range(14))              # 14 words
P3_TIE = " ".join(f"w{i}" for i in range(13))              # 13 words


def test_main_island_picks_heaviest_run(spark):
    page = "\n\n".join([P1, P2, BOIL, P3_BIG])
    df = spark.createDataFrame([(1, page)], "doc_id long, text string")
    row = boilerplate.main_island(df).collect()[0]
    assert (row.n_blocks, row.n_islands) == (1, 2)
    assert row.content == P3_BIG


def test_main_island_tie_breaks_to_earliest(spark):
    page = "\n\n".join([P1, P2, BOIL, P3_TIE])
    df = spark.createDataFrame([(1, page)], "doc_id long, text string")
    row = boilerplate.main_island(df).collect()[0]
    assert (row.n_blocks, row.n_islands) == (2, 2)
    assert row.content == P1 + "\n\n" + P2


def test_main_island_no_content_emits_no_row(spark):
    df = spark.createDataFrame([(1, NAV)], "doc_id long, text string")
    assert boilerplate.main_island(df).count() == 0


# --- reading-order repair -------------------------------------------------

def test_reading_order_column_major_in_bands(spark):
    rows = [
        (1, 0, 0, 0, "Title line"),
        (1, 1, 0, 0, "L1"), (1, 1, 1, 40, "R1"),
        (1, 2, 0, 0, "L2"), (1, 2, 1, 40, "R2"),
        (1, 3, 0, 0, "L3"), (1, 3, 1, 40, "R3"),
        (1, 4, 0, 0, "Footer"),
    ]
    runs = spark.createDataFrame(
        rows, "id long, line_no int, run_idx int, col_start int, run_text string"
    )
    got = [
        r.run_text
        for r in layout.reading_order(runs).orderBy("seq").collect()
    ]
    assert got == ["Title line", "L1", "L2", "L3", "R1", "R2", "R3", "Footer"]


def test_reading_order_no_band_is_line_major(spark):
    rows = [
        (1, 0, 0, 0, "a"), (1, 0, 1, 10, "b"),
        (1, 1, 0, 5, "c"),
    ]
    runs = spark.createDataFrame(
        rows, "id long, line_no int, run_idx int, col_start int, run_text string"
    )
    got = [r.run_text for r in layout.reading_order(runs).orderBy("seq").collect()]
    assert got == ["a", "b", "c"]
