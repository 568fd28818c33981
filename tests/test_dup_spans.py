"""Exact duplicated-span removal (dedup.remove_duplicated_spans —
Lee et al. 2021 substring dedup as shingle-occurrence counts)."""

from __future__ import annotations

import pytest

from doc_agent_spark.operators import dedup


def run(spark, rows, **kw):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return {r["id"]: r for r in dedup.remove_duplicated_spans(df, **kw).collect()}


def test_cross_doc_shared_span_removed_from_both(spark):
    got = run(spark, [
        (1, "alpha beta gamma delta epsilon zeta unique one tail"),
        (2, "prefix two alpha beta gamma delta epsilon zeta suffix"),
        (3, "totally different words here nothing shared at all"),
    ], k=3, min_count=2)
    assert set(got) == {1, 2}  # doc 3 untouched -> absent
    assert got[1]["text_clean"] == "unique one tail"
    assert got[2]["text_clean"] == "prefix two suffix"
    assert got[1]["n_tokens_removed"] == 6 and got[2]["n_tokens_removed"] == 6
    assert got[1]["n_dup_spans"] == 1


def test_within_doc_repeats_count_as_occurrences(spark):
    # 'x y x' appears at positions 0,2,4,... min_count=2 met inside ONE doc
    got = run(spark, [(4, "x y x y x y x y x y"),
                      (5, "unrelated content words only once here")], k=3, min_count=2)
    assert set(got) == {4}
    assert got[4]["text_clean"] == ""
    assert got[4]["n_tokens_removed"] == 10
    assert got[4]["n_dup_spans"] == 1


def test_disjoint_spans_counted_separately(spark):
    got = run(spark, [
        (1, "a b c ONE mid1 mid2 mid3 d e f TWO"),
        (2, "a b c OTHER d e f"),
    ], k=3, min_count=2)
    # doc 1: 'a b c' (tokens 0-2) and 'd e f' (tokens 7-9) duplicated,
    # separated by an untouched gap -> two maximal spans
    assert got[1]["n_dup_spans"] == 2
    assert got[1]["text_clean"] == "one mid1 mid2 mid3 two"
    assert got[2]["n_dup_spans"] == 2
    assert got[2]["text_clean"] == "other"


def test_min_count_threshold(spark):
    rows = [(i, f"shared shingle words here tail{i}") for i in range(2)]
    assert run(spark, rows, k=4, min_count=3) == {}
    got = run(spark, rows, k=4, min_count=2)
    assert set(got) == {0, 1}


def test_short_docs_emit_no_shingles(spark):
    got = run(spark, [(1, "a b"), (2, "a b")], k=3, min_count=2)
    assert got == {}


def test_deterministic_under_repartitioning(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    a = dedup.remove_duplicated_spans(docs.repartition(7), k=5, min_count=2)
    b = dedup.remove_duplicated_spans(docs.repartition(2), k=5, min_count=2)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_no_python_in_plan(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    plan = (
        dedup.remove_duplicated_spans(docs, k=5, min_count=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                "CartesianProduct"):
        assert bad not in plan, f"span removal plan contains {bad}"


# ---------------------------------------------------------------------------
# C4-style corpus-wide exact paragraph dedup (dedup.dedup_paragraphs)
# ---------------------------------------------------------------------------

def para(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return {r["id"]: r for r in dedup.dedup_paragraphs(df).collect()}


def test_paragraph_keep_first_global(spark):
    got = para(spark, [(1, "A\nB\nA"), (2, "B\nC"), (3, "A")])
    # doc1 keeps the first A and B; its own repeat of A drops
    assert got[1]["text_clean"] == "A\nB"
    assert (got[1]["n_paras"], got[1]["n_paras_removed"]) == (3, 1)
    # doc2's B lost to doc1's earlier occurrence
    assert got[2]["text_clean"] == "C"
    assert got[2]["n_paras_removed"] == 1
    # doc3 fully deduped but still present, empty survivor text
    assert got[3]["text_clean"] == ""
    assert (got[3]["n_paras"], got[3]["n_paras_removed"]) == (1, 1)


def test_paragraph_order_preserved_and_trim(spark):
    got = para(spark, [(1, "  z last  \n\n a first \nmiddle")])
    # blank line dropped, trimmed paragraphs keep original order
    assert got[1]["text_clean"] == "z last\na first\nmiddle"
    assert got[1]["n_paras_removed"] == 0


def test_paragraph_dedup_deterministic(spark, sf_dir):
    from doc_agent_spark.sources.tables import load
    from pyspark.sql import functions as F

    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat_ws("\n", F.lit("HDR"), "text", F.lit("FTR")).alias("text"),
    )
    a = sorted(
        tuple(r) for r in dedup.dedup_paragraphs(docs.repartition(1)).collect()
    )
    b = sorted(
        tuple(r) for r in dedup.dedup_paragraphs(docs.repartition(17)).collect()
    )
    assert a == b
    # HDR/FTR are corpus-wide boilerplate: exactly one doc keeps each
    kept_hdr = sum(1 for r in a if "HDR" in r[1])
    assert kept_hdr == 1
