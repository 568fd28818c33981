"""Bucketing for co-located joins (task brief: 'repartition/bucketing for
co-located joins'): two tables bucketed + sorted on the join key join with
ZERO exchanges — the shuffle happened once at write time, every subsequent
join of any bucketed pair is free. At 100 TB this is the difference between
re-shuffling the fact table per query and never shuffling it again."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    wh = tmp_path_factory.mktemp("wh")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").withColumnRenamed(
        "vec_id", "doc_id"
    )
    # external bucketed tables (explicit path: warehouse.dir is static)
    (docs.write.mode("overwrite").bucketBy(8, "doc_id").sortBy("doc_id")
         .option("path", str(wh / "docs_b")).saveAsTable("docs_b"))
    (emb.write.mode("overwrite").bucketBy(8, "doc_id").sortBy("doc_id")
        .option("path", str(wh / "emb_b")).saveAsTable("emb_b"))
    yield spark.table("docs_b"), spark.table("emb_b")
    spark.sql("DROP TABLE IF EXISTS docs_b")
    spark.sql("DROP TABLE IF EXISTS emb_b")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    docs_b, emb_b = bucketed
    joined = docs_b.select("doc_id", "lang").join(
        emb_b.select("doc_id", "label"), "doc_id"
    )
    # disable auto-broadcast so the test exercises the bucketed SMJ path
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # co-located: bucket layout replaces the shuffle
    rows = joined.count()
    assert rows > 0


def test_bucketed_aggregation_skips_shuffle(spark, bucketed):
    docs_b, _ = bucketed
    plan = (
        docs_b.groupBy("doc_id").agg(F.count("*"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # grouping key == bucket key
