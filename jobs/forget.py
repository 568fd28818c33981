"""Targeted-deletion propagation job (right-to-be-forgotten): remove a
drop list of document ids from EVERY id-bearing serving artifact the
index job committed, verify zero remnants, and record a completion
marker — immediate compliance without waiting for the next full index
rebuild.

    spark-submit --py-files dist.zip jobs/forget.py \\
        --index /warehouse/idx --drop /requests/forget_2026_08.parquet \\
        [--id-col id] [--bloom-min 100000]

What gets rewritten (all keyed on ``id``): ``embeddings``,
``minhash_bands``, ``sq_codes``, ``bm25_postings``, ``bm25_docstats``,
and ``ivf_cells`` — the last via AFFECTED-PARTITIONS-ONLY dynamic
overwrite: dropped ids are assigned to their cells first, and only those
cell partitions rewrite, so a 10-doc deletion touches 10-ish cells of a
10^6-cell index, not the whole table. ``bm25_corpus`` (n, avgdl) is a
derived aggregate and is RECOMPUTED from the filtered docstats — serving
scores stay consistent with the surviving corpus. Model-statistics
artifacts (``ivf_codebook``, ``sq_stats``) are unchanged: they hold
aggregate geometry, not records; the residual statistical influence of
dropped docs persists until the next scheduled rebuild (documented
limitation — same posture as Parquet zone maps after row deletion).

Drop-list application is the anti-join shape: broadcast anti join for
ordinary request batches, switching to the Bloom-reduced anti join
(plans/runtime_filter.bloom_anti_join — misses bypass the shuffle) at
``--bloom-min`` rows, the jobs/curate.py drop-list discipline.

Idempotency / crash model: deletion is naturally idempotent (filtering
already-filtered data rewrites identical bytes), so a crash mid-job is
repaired by re-running; the ``_FORGOTTEN`` marker (drop-list digest +
per-artifact remnant counts, all zero) is written only after every
artifact verifies clean. The AUTHORITATIVE deletion is from the upstream
corpus table (upsert sink / curate); this job makes the serving side
honest in the meantime.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# artifact -> partitioned-by column (None = plain directory overwrite)
REWRITE = {
    "embeddings": None,
    "minhash_bands": None,
    "sq_codes": None,
    "bm25_postings": None,
    "bm25_docstats": None,
}


def _anti(df: DataFrame, drops: DataFrame, id_col: str, n_drops: int,
          bloom_min: int) -> DataFrame:
    from doc_agent_spark.plans import runtime_filter as rf

    if n_drops >= bloom_min:
        return rf.bloom_anti_join(df, drops, id_col)
    return df.join(F.broadcast(drops), id_col, "left_anti")


def run_forget(
    spark: SparkSession,
    index_path: str,
    drop_df: DataFrame,
    id_col: str = "id",
    bloom_min: int = 100_000,
) -> dict:
    t0 = time.time()
    drops = drop_df.select(F.col(drop_df.columns[0]).alias(id_col)).distinct()
    drops = drops.localCheckpoint()  # one pass; reused by every artifact
    n_drops = drops.count()
    removed: dict[str, int] = {}
    remnants: dict[str, int] = {}

    def _rewrite_plain(name: str) -> None:
        p = os.path.join(index_path, name)
        df = spark.read.parquet(p).localCheckpoint()  # free the files for overwrite
        before = df.count()
        kept = _anti(df, drops, id_col, n_drops, bloom_min)
        kept.write.mode("overwrite").parquet(p)
        after = spark.read.parquet(p)
        removed[name] = before - after.count()
        remnants[name] = after.join(F.broadcast(drops), id_col, "left_semi").count()

    for name in REWRITE:
        _rewrite_plain(name)

    # ivf_cells: affected-partitions-only rewrite. The dropped ids' cells
    # come from the artifact itself (a semi join, partition-pruned by the
    # cell list at scale); only those cell partitions dynamic-overwrite.
    cells_path = os.path.join(index_path, "ivf_cells")
    cells = spark.read.parquet(cells_path)
    affected = sorted(
        r["cell"]
        for r in cells.join(F.broadcast(drops), id_col, "left_semi")
        .select("cell").distinct().collect()
    )
    if affected:
        slice_df = cells.filter(F.col("cell").isin(affected)).localCheckpoint()
        before = slice_df.count()
        kept = _anti(slice_df, drops, id_col, n_drops, bloom_min)
        prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            kept.write.mode("overwrite").partitionBy("cell").parquet(cells_path)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
        # dynamic-mode commits emit no _SUCCESS (the jobs/index.py session-4
        # lesson); re-touch it so the index job's committed-artifact probe
        # doesn't spuriously rebuild ivf_cells from the unfiltered corpus
        open(os.path.join(cells_path, "_SUCCESS"), "a").close()
        removed["ivf_cells"] = before - (
            spark.read.parquet(cells_path)
            .filter(F.col("cell").isin(affected)).count()
        )
    else:
        removed["ivf_cells"] = 0
    remnants["ivf_cells"] = (
        spark.read.parquet(cells_path)
        .join(F.broadcast(drops), id_col, "left_semi").count()
    )

    # bm25_corpus is a derived aggregate of docstats — recompute so (n,
    # avgdl) match the surviving corpus exactly
    ds = spark.read.parquet(os.path.join(index_path, "bm25_docstats"))
    corpus_path = os.path.join(index_path, "bm25_corpus")
    ds.agg(F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")).write.mode(
        "overwrite"
    ).parquet(corpus_path)

    clean = all(v == 0 for v in remnants.values())
    digest = drops.agg(
        F.sum(F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10)
              .cast("decimal(38,0)")).cast("string").alias("d")
    ).collect()[0]["d"]
    out = {
        "n_drops": n_drops,
        "removed": removed,
        "remnants": remnants,
        "clean": clean,
        "drop_digest": digest,
        "wall_ms": int((time.time() - t0) * 1000),
    }
    if clean:
        with open(os.path.join(index_path, "_FORGOTTEN"), "w") as fh:
            json.dump(out, fh)
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--index", required=True)
    ap.add_argument("--drop", required=True,
                    help="parquet path (first column = ids) or comma-separated ids")
    ap.add_argument("--id-col", default="id")
    ap.add_argument("--bloom-min", type=int, default=100_000)
    args = ap.parse_args()

    from extract import ship_package  # same zip+addPyFile bootstrap

    spark = SparkSession.builder.appName("forget").getOrCreate()
    ship_package(spark)
    if os.path.exists(args.drop):
        drop_df = spark.read.parquet(args.drop)
    else:
        ids = [s.strip() for s in args.drop.split(",") if s.strip()]
        try:
            rows = [(int(s),) for s in ids]
            drop_df = spark.createDataFrame(rows, f"{args.id_col} long")
        except ValueError:
            drop_df = spark.createDataFrame([(s,) for s in ids], f"{args.id_col} string")
    out = run_forget(spark, args.index, drop_df, id_col=args.id_col,
                     bloom_min=args.bloom_min)
    print(json.dumps(out))
    if not out["clean"]:
        sys.exit(4)


if __name__ == "__main__":
    main()
