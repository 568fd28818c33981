"""DSIR importance resampling (operators/dsir.py): the selector pulls the
corpus toward the target distribution, the Gumbel draw is deterministic at
any partition layout, weights are total over the input (token-free docs
included), and the SQL mirror computes the identical values."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from doc_agent_spark.operators import dsir

SPLITS = {"n_buckets": 512}


@pytest.fixture(scope="module")
def corpora(spark):
    raw = spark.createDataFrame(
        [
            (
                i,
                "stock market earnings dividend report quarterly finance"
                if i % 5 == 0
                else "the quick brown fox jumps over the lazy dog again "
                * (i % 3 + 1),
            )
            for i in range(60)
        ]
        + [(999, "")],  # token-free doc: must still get a weight row
        "id long, text string",
    )
    target = spark.createDataFrame(
        [(1000 + i, "finance earnings market stock report dividend") for i in range(4)],
        "id long, text string",
    )
    return raw, target


def test_weights_total_and_separation(corpora):
    raw, target = corpora
    w = dsir.importance_log_weights(raw, target, n_buckets=512)
    rows = {r["id"]: r["logw"] for r in w.collect()}
    assert len(rows) == 61  # one row per input doc, token-free included
    assert rows[999] == 0.0
    finance = [rows[i] for i in range(0, 60, 5)]
    other = [rows[i] for i in range(60) if i % 5]
    # every target-like doc outweighs every background doc
    assert min(finance) > max(other)


def test_gumbel_topk_prefers_heavy_docs_and_is_stable(corpora):
    raw, target = corpora
    # drop the token-free doc: its empty feature vector means w(x) = 1
    # (logw = 0), which legitimately outranks every doc with negative
    # logw — real pipelines drop empty docs before DSIR for this reason
    raw = raw.filter(F.col("id") != 999)
    sel = dsir.dsir_select(raw, target, k=12, n_buckets=512)
    got = [(r["id"], r["logw"], r["key"]) for r in sel.collect()]
    assert len(got) == 12
    assert len({g[0] for g in got}) == 12  # without replacement
    # all 12 finance docs win; with a ~40-nat weight gap the Gumbel noise
    # (~ units scale) can never promote a background doc over them
    assert {g[0] for g in got} == set(range(0, 60, 5))
    # layout-invariant: same selection from a different partitioning
    again = dsir.dsir_select(
        raw.repartition(7), target.coalesce(1), k=12, n_buckets=512
    ).collect()
    assert sorted((r["id"], r["logw"], r["key"]) for r in again) == sorted(got)


def test_weights_match_duckdb_mirror(corpora, spark):
    raw, target = corpora
    union = raw.unionByName(
        target.select("id", "text")
    ).withColumn("is_t", F.col("id") >= 1000)
    w = dsir.importance_log_weights(
        union, union.filter(F.col("is_t")), n_buckets=256
    )
    spark_rows = sorted(
        (r["id"], r["logw"]) for r in w.collect()
    )
    con = duckdb.connect()
    con.register("docs_pd", union.toPandas())
    sql = dsir.dsir_sql(
        "docs_pd", "id",
        "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), w -> w <> '')",
        "id >= 1000", k=1_000_000, n_buckets=256,
    )
    duck_rows = sorted(map(tuple, con.execute(sql).fetchall()))
    assert duck_rows == spark_rows


def test_rejects_bad_k(corpora):
    raw, target = corpora
    with pytest.raises(ValueError):
        dsir.dsir_select(raw, target, k=0)
