"""Crawl-frontier maintenance job — the cycle-N → cycle-N+1 shape: grow
the frontier from this cycle's fetched pages without rescanning history.

    spark-submit --py-files dist.zip jobs/frontier.py \\
        --fetched warehouse/crawl_2026_08 --seen warehouse/seen_urls \\
        --robots warehouse/robots --output warehouse/frontier_2026_09 \\
        --lineage warehouse/lineage --run-id f42 --crawl-delay 1.0

Inputs: ``--fetched`` (doc_id, url, text) — the pages this cycle actually
retrieved (e.g. the WARC ingest's docs bridge); ``--seen`` (url) — every
canonical URL already fetched or enqueued, snapshot N's dedup state;
``--robots`` (host, body) — the per-host robots.txt bodies. Outputs, each
independently committed (the jobs/index.py artifact-resume pattern —
parquet + _SUCCESS == done, re-run skips):

  discovered/  (url, host, n_refs)  distinct canonical outlinks extracted
               from fetched HTML + how many fetched pages referenced each
               — the in-batch citation count that doubles as priority
  frontier/    (url, host, priority, slot, fetch_offset_s)  NEW urls only
               (anti-joined against --seen; Bloom-reduced past
               --bloom-min, the jobs/curate.py drop-list shape),
               robots-filtered, politeness-scheduled per host
  blocked/     (url, host)  robots-disallowed discoveries, kept for audit
               (the never-silently-drop contract)

Snapshot N+1's seen set = seen ∪ discovered (union, never a rewrite — the
same mergeable-artifact rule as the minhash band index), so the cost of a
cycle scales with the batch's outlink mass, not with crawl history.

Scale shape: outlink extraction/resolution/canonicalization is scan-side
column algebra (functions/urls.py); the only shuffles are the per-URL
dedup groupBy and the per-host scheduling window; the seen anti join
ships a Bloom filter instead of the history table; robots rules are
per-host metadata and broadcast.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

ARTIFACTS = ["discovered", "frontier", "blocked"]

# shared job helpers — one definition, one future fix (jobs/pipeline.py
# imports _readable the same way)
from jobs.incremental import _read  # noqa: E402
from jobs.index import _readable  # noqa: E402


def run_frontier(
    spark: SparkSession,
    fetched_path: str,
    seen_path: str,
    robots_path: str,
    output_path: str,
    lineage_path: str,
    run_id: str,
    crawl_delay_s: float = 1.0,
    bloom_min: int = 1_000_000,
    sitemaps_path: str | None = None,
    records_path: str | None = None,
    ranks_path: str | None = None,
    seen_out_path: str | None = None,
) -> dict:
    from doc_agent_spark.functions import urls
    from doc_agent_spark.operators import frontier as frontops
    from doc_agent_spark.operators.publish import check_or_write_config
    from doc_agent_spark.plans import runtime_filter

    t0 = time.time()
    out = output_path.rstrip("/")
    # frontier artifacts are a deterministic function of (inputs, config);
    # resuming under a different config would mix disagreeing artifacts.
    # The optional channels change artifact CONTENT (records → redirect
    # edges in discovered/, ranks → host_rank in frontier/, bloom_min →
    # seen-set reduction shape), so their presence is part of the identity.
    check_or_write_config(out, {
        "job": "frontier", "crawl_delay_s": crawl_delay_s,
        "bloom_min": bloom_min,
        "sitemaps": sitemaps_path, "records": records_path,
        "ranks": ranks_path,
    })
    fetched = _read(spark, fetched_path).select("url", "text")
    seen = _read(spark, seen_path).select("url")
    robots = _read(spark, robots_path).select("host", "body")
    built: dict[str, int] = {}
    reused: dict[str, bool] = {}

    def _append_lineage(name: str, rows: int, wall_ms: int) -> None:
        spark.createDataFrame(
            [(run_id, "frontier", ARTIFACTS.index(name), "done",
              rows, rows, 0, 0, wall_ms)],
            "run_id string, stage string, partition_id int, status string, "
            "docs_in long, docs_out long, spans_out long, parse_failures long, "
            "wall_ms long",
        ).withColumn("finished_at", F.current_timestamp()).write.mode(
            "append"
        ).parquet(lineage_path)

    def _lineage_row_exists(pid: int) -> bool:
        try:
            from doc_agent_spark.schema import LINEAGE

            return bool(
                spark.read.schema(LINEAGE).parquet(lineage_path)
                .filter(
                    (F.col("run_id") == run_id)
                    & (F.col("stage") == "frontier")
                    & (F.col("partition_id") == pid)
                )
                .head(1)
            )
        except Exception:
            return False

    def commit(name: str, build):
        path = f"{out}/{name}"
        existing = _readable(spark, path)
        if existing is not None:
            reused[name] = True
            built[name] = existing.count()
            if not _lineage_row_exists(ARTIFACTS.index(name)):
                _append_lineage(name, built[name], 0)
            return existing
        t = time.time()
        frame = build()
        frame.write.mode("overwrite").parquet(path)
        committed = spark.read.parquet(path)
        reused[name] = False
        built[name] = committed.count()
        _append_lineage(name, built[name], int((time.time() - t) * 1000))
        return committed

    def build_discovered():
        # n_refs = DISTINCT referencing sources (a nav that repeats one
        # href 50 times is one citation, not fifty); each discovery
        # channel is its own source — a page URL, a redirect's source URI,
        # or the sitemap listing
        links = (
            fetched.select(
                "url",
                F.explode(urls.extract_hrefs(F.col("text"))).alias("ref"),
            )
            .filter(~F.col("ref").startswith("#"))
            .select(
                F.col("url").alias("src"),
                urls.resolve_url(F.col("url"), F.col("ref")).alias("res"),
            )
            .filter(F.col("res").rlike("^https?://"))
            .select("src", urls.url_canonicalize(F.col("res")).alias("link"))
        )
        if sitemaps_path is not None:
            sm = frontops.sitemap_locs(_read(spark, sitemaps_path))
            links = links.unionByName(
                sm.filter(F.col("url").rlike("^https?://")).select(
                    F.lit("sitemap").alias("src"),
                    urls.url_canonicalize(F.col("url")).alias("link"),
                )
            )
        if records_path is not None:
            from doc_agent_spark.sources import warc as warcsrc

            links = links.unionByName(
                warcsrc.redirect_edges(_read(spark, records_path)).select(
                    F.col("src"), F.col("dst").alias("link")
                )
            )
        return links.groupBy("link").agg(
            F.count_distinct(F.col("src")).alias("n_refs")
        ).select(
            F.col("link").alias("url"),
            urls.url_host(F.col("link")).alias("host"),
            "n_refs",
        )

    discovered = commit("discovered", build_discovered)

    def build_new():
        n_seen = seen.count()
        if n_seen >= bloom_min:
            # ~10 bits/key, capped at 2^30 (the jobs/curate.py sizing);
            # under 4 bits/key the FP rate makes the maybe slice ~everything
            m_bits = min(max(n_seen * 10, 1 << 20), 1 << 30)
            if m_bits / max(n_seen, 1) >= 4:
                return runtime_filter.bloom_anti_join(
                    discovered, seen, "url", m_bits=m_bits
                )
        return discovered.join(seen, "url", "left_anti")

    # the seen anti-join + robots chain feeds BOTH remaining artifacts:
    # build it once (checkpoint) and only when an artifact actually needs
    # it — a fully-resumed run must pay neither the chain nor seen.count()
    _fl: list = []

    def flagged():
        if not _fl:
            fl = frontops.robots_filter(
                build_new(), frontops.parse_robots(robots)
            )
            _fl.append(fl.localCheckpoint(eager=True))
        return _fl[0]

    def build_frontier():
        # hosts publishing a Crawl-delay pace at their own rate; everyone
        # else at the job default (per-host metadata -> broadcast join)
        sched = frontops.schedule_frontier(
            flagged().filter(~F.col("blocked")).drop("blocked"),
            "n_refs", crawl_delay_s=crawl_delay_s,
            delays=frontops.crawl_delays(robots),
        ).select(
            "url", "host", F.col("n_refs").alias("priority"),
            "slot", "fetch_offset_s",
        )
        # host authority (e.g. graphrank.pagerank over the fetched link
        # graph) rides along for the FETCHER's cross-host ordering —
        # within a host the politeness slots already fix the order, and
        # an unseen URL has no page-level rank, so host-sum is the right
        # granularity for the crawl prior
        if ranks_path is not None:
            hr = (
                _read(spark, ranks_path)
                .select(urls.url_host(F.col("id")).alias("host"),
                        F.col("rank"))
                .groupBy("host").agg(F.sum("rank").alias("host_rank"))
            )
            sched = sched.join(F.broadcast(hr), "host", "left").withColumn(
                "host_rank", F.coalesce(F.col("host_rank"), F.lit(0.0))
            )
        return sched

    commit("frontier", build_frontier)
    commit("blocked", lambda: (
        flagged().filter(F.col("blocked")).select("url", "host")
    ))
    if seen_out_path is not None:
        # snapshot N+1's dedup state = seen ∪ discovered, written to a NEW
        # path (never a rewrite of snapshot N — the mergeable-artifact
        # rule); committed with the same _SUCCESS/resume contract so a
        # crashed cycle re-runs cleanly
        if _readable(spark, seen_out_path) is None:
            seen.unionByName(discovered.select("url")).distinct().write.mode(
                "overwrite"
            ).parquet(seen_out_path)
        built["seen_out"] = spark.read.parquet(seen_out_path).count()
    return {
        "run_id": run_id,
        "fetched_pages": fetched.count(),
        "discovered": built["discovered"],
        "frontier": built["frontier"],
        "blocked": built["blocked"],
        "seen_out": built.get("seen_out"),
        "reused": reused,
        "artifacts_reused": sum(reused.values()),
        "wall_ms": int((time.time() - t0) * 1000),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fetched", required=True)
    ap.add_argument("--seen", required=True)
    ap.add_argument("--robots", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--lineage", required=True)
    ap.add_argument("--run-id", required=True)
    ap.add_argument("--crawl-delay", type=float, default=1.0)
    ap.add_argument("--bloom-min", type=int, default=1_000_000)
    ap.add_argument("--sitemaps", default=None,
                    help="optional parquet of sitemap XML bodies (body)")
    ap.add_argument("--records", default=None,
                    help="optional parsed-WARC records parquet; 3xx "
                         "Location targets join the discovered set")
    ap.add_argument("--seen-out", default=None,
                    help="write snapshot N+1's seen set (seen UNION "
                         "discovered) to this NEW path")
    ap.add_argument("--ranks", default=None,
                    help="optional (id, rank) parquet (e.g. PageRank over "
                         "the crawled graph); host-summed authority joins "
                         "the frontier as host_rank")
    args = ap.parse_args()

    from jobs.extract import ship_package

    spark = SparkSession.builder.appName(f"frontier-{args.run_id}").getOrCreate()
    ship_package(spark)
    try:
        print(json.dumps(run_frontier(
            spark, args.fetched, args.seen, args.robots, args.output,
            args.lineage, args.run_id, crawl_delay_s=args.crawl_delay,
            bloom_min=args.bloom_min, sitemaps_path=args.sitemaps,
            records_path=args.records, ranks_path=args.ranks,
            seen_out_path=args.seen_out,
        )))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
