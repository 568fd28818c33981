"""C4 rule-based line/page cleaning (functions/c4rules.py): line keep
rules, page flags on the RAW text, the sentence floor, and engine parity
with the SQL mirror."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from doc_agent_spark.functions import c4rules

PAGE = "\n".join([
    "this line has plenty of words and ends properly.",
    "short line.",                                   # < 5 words
    "please enable JavaScript to continue with it.",  # javascript
    "this line has no terminal punctuation at all",   # ending
    "another perfectly reasonable sentence sits here!",
    "  and a trimmed line with a question mark here?  ",
])


@pytest.fixture(scope="module")
def one(spark):
    return spark.createDataFrame([(1, PAGE)], "id long, text string")


def test_line_rules(one):
    row = one.select(c4rules.c4_clean(F.col("text")).alias("c")).collect()[0]
    kept = row["c"].split("\n")
    assert kept == [
        "this line has plenty of words and ends properly.",
        "another perfectly reasonable sentence sits here!",
        "and a trimmed line with a question mark here?",
    ]


def test_page_pass_flags_raw_not_clean(spark):
    rows = [
        (1, PAGE),                                          # 3 sentences, clean
        (2, PAGE + "\nlorem ipsum dolor sit amet sed."),     # lorem flag
        (3, PAGE + "\nvar config = { debug: false };"),      # brace flag
        (4, "only two sentences survive here fine.\n"
            "and this second one also survives intact."),    # < 3 sentences
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    clean = c4rules.c4_clean(F.col("text"))
    got = {
        r["id"]: (r["p"], r["n"])
        for r in df.select(
            "id",
            c4rules.c4_page_pass(F.col("text"), clean).alias("p"),
            c4rules.n_sentences(clean).alias("n"),
        ).collect()
    }
    assert got[1] == (True, 3)
    assert got[2][0] is False   # lorem line is kept in clean, page still fails
    assert got[3][0] is False
    assert got[4] == (False, 2)


def test_matches_sql_mirror(spark):
    rows = [(i, PAGE + (f"\nextra sentence number {i} lives here." if i % 2 else ""))
            for i in range(20)]
    df = spark.createDataFrame(rows, "id long, text string")
    clean = c4rules.c4_clean(F.col("text"))
    spark_rows = sorted(
        map(tuple, df.select(
            "id", clean.alias("c"),
            c4rules.n_sentences(clean).alias("n"),
            c4rules.c4_page_pass(F.col("text"), clean).alias("p"),
        ).collect())
    )
    con = duckdb.connect()
    con.execute("SET threads=2")
    con.register("t", df.toPandas())
    sql = f"""
SELECT id, c, CAST({c4rules.n_sentences_sql('c')} AS INTEGER) AS n,
       {c4rules.c4_page_pass_sql('text', 'c')} AS p
FROM (SELECT id, text, {c4rules.c4_clean_sql('text')} AS c FROM t)
"""
    duck_rows = sorted(map(tuple, con.execute(sql).fetchall()))
    assert duck_rows == spark_rows
