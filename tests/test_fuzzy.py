"""SymSpell-style fuzzy matching (operators/fuzzy.py): 1-deletion
neighborhood candidate generation + levenshtein verify, both engines."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from doc_agent_spark.operators import fuzzy


def test_deletion_variants(spark):
    df = spark.createDataFrame([("abc",)], "s string")
    got = df.select(fuzzy.deletion_variants(F.col("s")).alias("v")).collect()[0].v
    assert set(got) == {"abc", "bc", "ac", "ab"}


def test_fuzzy_match_catches_all_edit1_kinds(spark):
    left = spark.createDataFrame(
        [("acme corp",),      # exact
         ("acme cor",),       # deletion
         ("acme corpx",),     # insertion
         ("acme zorp",),      # substitution
         ("totally other",)], # no match
        "left_val string",
    )
    right = spark.createDataFrame([("acme corp",), ("bravo inc",)], "right_val string")
    got = {
        (r.left_val, r.right_val): r.dist
        for r in fuzzy.fuzzy_match_del1(left, right, "left_val", "right_val").collect()
    }
    assert got == {
        ("acme corp", "acme corp"): 0,
        ("acme cor", "acme corp"): 1,
        ("acme corpx", "acme corp"): 1,
        ("acme zorp", "acme corp"): 1,
    }


def test_fuzzy_sql_mirror_agrees(spark):
    lrows = [("acme corp",), ("acme cor",), ("acme corpx",), ("acme zorp",),
             ("bravo inc",), ("bravo 1nc",), ("nope",)]
    rrows = [("acme corp",), ("bravo inc",)]
    left = spark.createDataFrame(lrows, "left_val string")
    right = spark.createDataFrame(rrows, "right_val string")
    s = sorted(
        (r.left_val, r.right_val, r.dist)
        for r in fuzzy.fuzzy_match_del1(left, right, "left_val", "right_val").collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE l(left_val VARCHAR); CREATE TABLE r(right_val VARCHAR)")
    con.executemany("INSERT INTO l VALUES (?)", lrows)
    con.executemany("INSERT INTO r VALUES (?)", rrows)
    d = sorted(tuple(x) for x in con.execute(fuzzy.fuzzy_match_del1_sql("l", "r")).fetchall())
    assert s == d and len(s) >= 6
