"""KMV distinct sketch: accuracy bound, exact below-k behavior, and the
arrow-partial == relational equivalence that justifies the scale path."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from doc_agent_spark.operators import sketches


def test_kmv_estimate_within_error_bound(spark):
    n = 5000
    df = spark.range(n).select((F.col("id") * 7 + 3).alias("v"))
    r = sketches.kmv_distinct_estimate(df, "v", k=256).collect()[0]
    assert r.k_used == 256
    assert abs(r.estimate - n) / n < 0.25  # ~4 std errors at k=256


def test_kmv_exact_below_k(spark):
    df = spark.range(40).select(F.col("id").alias("v"))
    # duplicates must not inflate the count
    df = df.unionByName(df)
    r = sketches.kmv_distinct_estimate(df, "v", k=256).collect()[0]
    assert (r.k_used, r.estimate) == (40, 40.0)


def test_kmv_arrow_partial_equals_relational(spark):
    df = spark.range(3000).select((F.col("id") % 997).alias("v")).repartition(13)
    a = sketches.kmv_distinct_estimate(df, "v", k=128, arrow_partial=True).collect()[0]
    b = sketches.kmv_distinct_estimate(df, "v", k=128, arrow_partial=False).collect()[0]
    assert tuple(a) == tuple(b)
