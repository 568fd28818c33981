"""Resilient ingest (sources/ingest.py): corrupt-record quarantine for
JSONL and CSV — malformed rows are captured whole, never dropped, never
fatal, and the clean side parses exactly the valid records."""

from __future__ import annotations

import pytest

from doc_agent_spark.sources import ingest


@pytest.fixture()
def jsonl_file(tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"id": 1, "text": "alpha"}\n'
        '{"id": 2, "text": "beta"}\n'
        '{"id": 3, "text": "gamma", "extra": true}\n'   # unknown field: fine
        '{"id": "not a number", "text": "delta"}\n'     # type mismatch
        "{truncated line\n"                             # broken JSON
        '{"id": 6, "text": "zeta"}\n'
    )
    return str(p)


def test_jsonl_split_counts_and_values(spark, jsonl_file):
    df = ingest.read_jsonl(spark, jsonl_file, "id long, text string")
    clean, bad = ingest.split_quarantine(df)
    got = {r.id: r.text for r in clean.collect()}
    assert got == {1: "alpha", 2: "beta", 3: "gamma", 6: "zeta"}
    raw = sorted(r._corrupt_record for r in bad.collect())
    assert len(raw) == 2
    assert any("not a number" in r for r in raw)
    assert any(r.startswith("{truncated") for r in raw)


def test_jsonl_quarantine_keeps_whole_line(spark, jsonl_file):
    """The quarantined payload is the raw input line — replayable after a
    parser fix, not a lossy fragment."""
    df = ingest.read_jsonl(spark, jsonl_file, "id long, text string")
    _, bad = ingest.split_quarantine(df)
    rows = bad.collect()
    assert all(r._corrupt_record is not None for r in rows)


def test_csv_quarantine_and_parseable_prefix(spark, tmp_path):
    p = tmp_path / "docs.csv"
    p.write_text(
        "id,text,n\n"
        "1,alpha,10\n"
        "2,beta,not_an_int\n"     # type mismatch in last field
        "3,gamma,30\n"
    )
    df = ingest.read_csv(spark, str(p), "id long, text string, n long")
    clean, bad = ingest.split_quarantine(df)
    assert {r.id for r in clean.collect()} == {1, 3}
    badrows = bad.collect()
    assert len(badrows) == 1
    # parseable prefix survives alongside the raw line
    assert badrows[0].id == 2 and badrows[0].text == "beta"
    assert badrows[0].n is None
    assert badrows[0]._corrupt_record == "2,beta,not_an_int"


def test_empty_and_all_bad_files(spark, tmp_path):
    """Corrupt-only aggregates (bad.count()) are only legal off a
    materialized frame — Spark rejects them on a raw file scan."""
    p = tmp_path / "bad.jsonl"
    p.write_text("nope\nstill nope\n")
    df = ingest.read_jsonl(spark, str(p), "id long")
    clean, bad = ingest.split_quarantine(df, materialize=True)
    try:
        assert clean.count() == 0
        assert bad.count() == 2
    finally:
        df.unpersist()


def test_corrupt_only_count_requires_materialize(spark, tmp_path):
    import pyspark.errors

    p = tmp_path / "bad2.jsonl"
    p.write_text("nope\n")
    df = ingest.read_jsonl(spark, str(p), "id long")
    _, bad = ingest.split_quarantine(df)
    with pytest.raises(pyspark.errors.AnalysisException):
        bad.count()
