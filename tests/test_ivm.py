"""Incremental view maintenance (operators/ivm.py): view_old ∪ delta is
row-identical to re-joining the updated tables, term provenance is
disjoint and complete, and empty deltas produce empty maintenance."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from doc_agent_spark.operators import ivm


def _tables(spark):
    a = spark.createDataFrame(
        [(k, f"a{k}") for k in range(8)], "k long, av string"
    )
    b = spark.createDataFrame(
        [(k % 6, i, k * 1.5) for i, k in enumerate(range(12))],
        "k long, bi long, bv double",
    )
    return a, b


def _split(df, pred):
    return df.filter(~pred), df.filter(pred)


def _rows(df, cols):
    return Counter(tuple(r[c] for c in cols) for r in df.collect())


def test_view_plus_delta_equals_full_rejoin(spark):
    a, b = _tables(spark)
    a_old, da = _split(a, F.col("k") % 3 == 0)
    b_old, db = _split(b, F.col("bi") % 4 == 0)
    view_old = a_old.join(b_old, "k")
    delta = ivm.join_delta(a_old, da, b_old, db, "k").drop("ivm_src")
    cols = ["k", "av", "bi", "bv"]
    maintained = _rows(view_old.select(*cols), cols) + _rows(delta.select(*cols), cols)
    full = _rows(a.join(b, "k").select(*cols), cols)
    assert maintained == full


def test_provenance_terms_disjoint_and_complete(spark):
    a, b = _tables(spark)
    a_old, da = _split(a, F.col("k") % 3 == 0)
    b_old, db = _split(b, F.col("bi") % 4 == 0)
    delta = ivm.join_delta(a_old, da, b_old, db, "k")
    by_src = {r["ivm_src"]: r["n"] for r in
              delta.groupBy("ivm_src").agg(F.count("*").alias("n")).collect()}
    assert set(by_src) <= {"dA*B", "A*dB", "dA*dB"}
    # term counts reproduce the direct pairwise joins
    assert by_src.get("dA*B", 0) == da.join(b_old, "k").count()
    assert by_src.get("A*dB", 0) == a_old.join(db, "k").count()
    assert by_src.get("dA*dB", 0) == da.join(db, "k").count()


def test_empty_deltas_empty_maintenance(spark):
    a, b = _tables(spark)
    empty_a = a.filter(F.lit(False))
    empty_b = b.filter(F.lit(False))
    assert ivm.join_delta(a, empty_a, b, empty_b, "k").count() == 0
    # one-sided batch exercises exactly one term
    delta = ivm.join_delta(a, empty_a, b.filter(F.col("bi") != 0), b.filter(F.col("bi") == 0), "k")
    assert {r["ivm_src"] for r in delta.select("ivm_src").distinct().collect()} == {"A*dB"}
