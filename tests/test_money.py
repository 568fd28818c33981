"""Locale-aware amount parsing (functions/money.py): separator
disambiguation, accounting negatives, currency detection — pinned on
hand-computed cases and mirrored into DuckDB via parse_amount_sql."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from doc_agent_spark.functions import money

CASES = [
    ("$1,234.56", 1234.56, "USD"),
    ("1.234,56 €", 1234.56, "EUR"),
    ("CHF 1'234.50", 1234.5, "CHF"),
    ("(2,500.00) USD", -2500.0, "USD"),
    ("JPY 120400", 120400.0, "JPY"),
    ("-1234,75", -1234.75, ""),
    ("£99", 99.0, "GBP"),
    ("1,234", 1234.0, ""),          # ambiguous single comma + 3 digits -> thousands
    ("1,23", 1.23, ""),             # 2 trailing digits -> decimal
    ("1.234", 1234.0, ""),
    ("12.345.678", 12345678.0, ""),
    ("1 234,56", 1234.56, ""),      # space thousands
    ("no numbers here", None, ""),
    ("total: 7", 7.0, ""),
    # hyphen glued to an identifier is NOT a sign; spaces only group 3s
    ("INV-2024 total 50.00", 2024.0, ""),   # first-run contract: id wins
    ("fee -99", -99.0, ""),
    ("rooms 2, 3 occupied", 2.0, ""),       # no space-fusing into 2.3
]


def test_parse_amount_cases(spark):
    df = spark.createDataFrame(
        [(i, s) for i, (s, _, _) in enumerate(CASES)], "i long, raw string"
    )
    got = {
        r.i: (r.p.amount, r.p.currency)
        for r in df.select("i", money.parse_amount(F.col("raw")).alias("p")).collect()
    }
    for i, (s, amt, cur) in enumerate(CASES):
        assert got[i] == (amt, cur), f"{s!r}: got {got[i]}, want {(amt, cur)}"


def test_parse_amount_sql_mirror_agrees():
    con = duckdb.connect()
    expr = money.parse_amount_sql("raw")
    for s, amt, cur in CASES:
        row = con.execute(
            f"SELECT ({expr}).amount, ({expr}).currency FROM (SELECT ? AS raw)", [s]
        ).fetchone()
        assert row == (amt, cur), f"{s!r}: duckdb got {row}, want {(amt, cur)}"
