"""Page-assembly goldens (ported from ocr.test.ts:27-109) — checked against
BOTH the pure spec and the Spark column-expression implementation, proving
the codegen path equals the reference semantics.
"""

import pytest

from pyspark.sql import functions as F

from doc_agent_spark.functions.assembly import assemble_page_text, assemble_pages_array
from doc_agent_spark.spec import assemble_pages

CASES = [
    # (pages, expected) — from ocr.test.ts
    ([], ""),                                                  # :28-31
    (["Hello World"], "--- Page 1 ---\nHello World"),          # :33-45
    (
        ["Page 1 content", "Page 2 content", "Page 3 content"],
        "--- Page 1 ---\nPage 1 content\n\n--- Page 2 ---\nPage 2 content\n\n--- Page 3 ---\nPage 3 content",
    ),                                                         # :47-61
    (["Has content", "   "], "--- Page 1 ---\nHas content"),   # :63-73 empty filtered
    (["Good page", ""], "--- Page 1 ---\nGood page"),          # :98-109 failed OCR page → ''
    # numbering assigned BEFORE filtering (ocr.ts:46): page 3 keeps its number
    (["P1", "   ", "P3"], "--- Page 1 ---\nP1\n\n--- Page 3 ---\nP3"),
    (["  padded  "], "--- Page 1 ---\npadded"),                # trim semantics
]


@pytest.mark.parametrize("pages,expected", CASES)
def test_spec_assembly(pages, expected):
    assert assemble_pages(pages) == expected


def test_spark_expr_assembly_matches_spec(spark):
    rows = [(i, pages) for i, (pages, _exp) in enumerate(CASES)]
    df = spark.createDataFrame(rows, "case_id int, pages array<string>")
    got = {
        r.case_id: r.out
        for r in df.select("case_id", assemble_pages_array(F.col("pages")).alias("out")).collect()
    }
    for i, (_pages, exp) in enumerate(CASES):
        assert got[i] == exp, f"case {i}"


def test_spark_span_assembly_orders_by_offset(spark):
    # spans arrive in scrambled array order; offset defines page numbers
    spans = [
        {"kind": "media", "text": "B", "media_ref": "m2", "offset": 1},
        {"kind": "text", "text": "A", "media_ref": "", "offset": 0},
        {"kind": "text", "text": "  ", "media_ref": "", "offset": 2},
        {"kind": "media", "text": "D", "media_ref": "m4", "offset": 3},
    ]
    df = spark.createDataFrame(
        [("d1", spans)],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    out = df.select(assemble_page_text(F.col("spans")).alias("t")).collect()[0].t
    assert out == "--- Page 1 ---\nA\n\n--- Page 2 ---\nB\n\n--- Page 4 ---\nD"


# --- reflow (de-hyphenation + soft-wrap repair) --------------------------

def test_reflow_dehyphenates_and_unwraps(spark):
    from doc_agent_spark.functions.assembly import reflow_text

    txt = (
        "The interna-\ntional aspects are docu-\nmented here.\n"
        "Next paragraph starts now.\n\nSecond paragraph\nwraps softly."
    )
    df = spark.createDataFrame([(1, txt)], "id long, text string")
    got = df.select(reflow_text(F.col("text")).alias("r")).collect()[0].r
    assert got == (
        "The international aspects are documented here.\n"
        "Next paragraph starts now.\n\nSecond paragraph wraps softly."
    )


def test_reflow_keeps_hyphen_before_uppercase(spark):
    from doc_agent_spark.functions.assembly import reflow_text

    df = spark.createDataFrame(
        [(1, "the Jackson-\nPollock estimate holds.")], "id long, text string"
    )
    got = df.select(reflow_text(F.col("text")).alias("r")).collect()[0].r
    # capital continuation: hyphen survives, soft wrap still joins
    assert got == "the Jackson- Pollock estimate holds."


# --- cross-page header/footer strip --------------------------------------

def _strip(spark, pages, min_pages=3):
    from doc_agent_spark.functions.assembly import strip_repeated_page_lines

    df = spark.createDataFrame([(1, pages)], "id long, pages array<string>")
    return df.select(
        strip_repeated_page_lines(F.col("pages"), min_pages).alias("s")
    ).collect()[0].s


def test_hdrfoot_strips_repeated_and_digit_normalized(spark):
    s = _strip(
        spark,
        [
            "ACME Corp\nbody one\nPage 1 of 9",
            "ACME Corp\nbody two\nPage 2 of 9",
            "ACME Corp\nbody three\nPage 3 of 9",
        ],
    )
    assert list(s.pages) == ["body one", "body two", "body three"]
    assert s.removed == 6


def test_hdrfoot_below_threshold_kept(spark):
    s = _strip(
        spark,
        [
            "ACME Corp\nbody one\nPage 1 of 9",
            "ACME Corp\nbody two\nPage 2 of 9",
            "Other\nbody three\nPage 3 of 9",
        ],
    )
    # headers repeat on only 2 pages -> kept; footers stripped on all 3
    assert s.pages[0].startswith("ACME Corp\n")
    assert s.pages[2].startswith("Other\n")
    assert all(not p.endswith("of 9") for p in s.pages)
    assert s.removed == 3


def test_hdrfoot_header_only_page_empties(spark):
    s = _strip(spark, ["HDR", "HDR\nbody\nPage 1 of 2"], min_pages=2)
    assert list(s.pages) == ["", "body\nPage 1 of 2"]
    assert s.removed == 2


def test_hdrfoot_input_empty_page_counts_zero_removed(spark):
    s = _strip(spark, ["", "x\ny", "z"], min_pages=3)
    assert list(s.pages) == ["", "x\ny", "z"]
    assert s.removed == 0


def test_reflow_one_char_wrapped_line_joined(spark):
    from doc_agent_spark.functions.assembly import reflow_text

    df = spark.createDataFrame([(1, "x\n1\ny")], "id long, text string")
    assert df.select(reflow_text(F.col("text")).alias("r")).collect()[0].r == "x 1 y"


def test_let_binding_value_equivalence(spark):
    """let_(v, body) must be value-identical to body(v) for every type it
    is used with (arrays, structs, strings) including NULL inputs — the
    helper now underpins shingles, jusText, layout, chunking, minhash and
    language ID, so a semantic regression here would corrupt all of them
    silently."""
    from pyspark.sql import functions as F

    from doc_agent_spark.functions.assembly import let_

    df = spark.createDataFrame(
        [("a b c",), (" ",), (None,)], "t string"
    )
    arr = F.split(F.col("t"), " ")
    rows = df.select(
        let_(arr, lambda w: F.size(w)).alias("let_size"),
        F.size(arr).alias("raw_size"),
        let_(arr, lambda w: F.concat_ws("|", w)).alias("let_join"),
        F.concat_ws("|", arr).alias("raw_join"),
        let_(
            F.struct(arr.alias("w"), F.length("t").alias("n")),
            lambda s: s["n"] + F.size(s["w"]),
        ).alias("let_struct"),
        (F.length("t") + F.size(arr)).alias("raw_struct"),
    ).collect()
    for r in rows:
        assert r["let_size"] == r["raw_size"]
        # concat_ws treats a NULL array as empty; the binding must too
        assert r["let_join"] == r["raw_join"]
        assert r["let_struct"] == r["raw_struct"]
