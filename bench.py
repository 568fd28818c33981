"""Benchmark runner — prints ONE JSON line.

Headline metric: end-to-end extraction throughput (docs/sec) over the
deterministic synthetic interleaved-span corpus (seed=42, FIXTURES.md §1),
plus per-query wall times for the operator suite at $SPARK_GRAFT_SF_DIR.

Env knobs:
  SPARK_GRAFT_SF_DIR   table dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[N] parallelism (default 32)
  BENCH_DOCS           synthetic corpus size (default 1_500_000)
  BENCH_SCALING=1      also run the N-vs-4N scaling protocol (local[N/4]
                       vs local[N]) and report scaling_efficiency
                       (BASELINE.md §3)

The corpus is generated ONCE (distributed, via Spark mapInPandas over a
range — generation itself is a narrow pipeline) and cached under
.bench/corpus_<n>.parquet. Timings measure job wall (action to completion,
noop sink), never session startup.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench")


def ensure_corpus(spark, n_docs: int) -> str:
    path = os.path.join(BENCH_DIR, f"corpus_{n_docs}.parquet")
    if os.path.exists(path + "/_SUCCESS"):
        return path
    from doc_agent_spark.corpus import make_doc
    from doc_agent_spark.schema import DOCUMENTS_SPANS

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = [make_doc(int(i)) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=["doc_id", "spans"])

    os.makedirs(BENCH_DIR, exist_ok=True)
    tmp = path + "._tmp"
    (
        spark.range(n_docs)
        .repartition(max(spark.sparkContext.defaultParallelism * 2, 16))
        .mapInPandas(gen, DOCUMENTS_SPANS)
        .write.mode("overwrite")
        .parquet(tmp)
    )
    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(tmp, path)
    return path


def run_noop(df) -> float:
    t = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t


def extraction_job(spark, corpus_path):
    from doc_agent_spark.operators import extractor

    docs = spark.read.parquet(corpus_path)
    return extractor.extracted_spans(docs)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_docs = int(os.environ.get("BENCH_DOCS", "1500000"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from doc_agent_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(app="bench", master=f"local[{cpus}]", shuffle_partitions=cpus * 2)
    corpus_path = ensure_corpus(spark, n_docs)

    queries: dict[str, float] = {}

    # headline: end-to-end extraction over the interleaved corpus
    ext_sec = run_noop(extraction_job(spark, corpus_path))
    queries["extraction_corpus"] = round(ext_sec, 3)
    docs_per_sec = n_docs / ext_sec

    qmap = entrymod.queries()
    for name in (
        "q1_pricing_summary", "q3_shipping_priority", "q5_nation_revenue",
        "events_sessions", "page_assembly", "dedup_exact", "minhash_lsh_pairs",
        "simhash_clusters", "cosine_topk", "ann_lsh_topk", "bm25_topk",
        "rrf_fusion", "lang_id_counts", "quality_tokens", "extraction_flagship",
    ):
        queries[name] = round(run_noop(qmap[name](spark, sf_dir)), 3)

    result = {
        "metric": "end-to-end extraction throughput (synthetic interleaved corpus) + operator suite",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_docs": n_docs,
        "docs_per_sec": round(docs_per_sec, 1),
        "cpus": cpus,
    }

    if os.environ.get("BENCH_SCALING") == "1":
        spark.stop()
        lo, hi = max(cpus // 4, 1), cpus
        rates = {}
        for n in (lo, hi):
            s = get_spark(app=f"bench-scale-{n}", master=f"local[{n}]", shuffle_partitions=n * 2)
            sec = run_noop(extraction_job(s, corpus_path))
            rates[n] = n_docs / sec
            s.stop()
        eff = (rates[hi] / rates[lo]) / (hi / lo)
        result["scaling"] = {
            "n_small": lo, "n_large": hi,
            "docs_per_sec_small": round(rates[lo], 1),
            "docs_per_sec_large": round(rates[hi], 1),
            "efficiency": round(eff, 3),
        }
    else:
        spark.stop()

    print(json.dumps(result))


if __name__ == "__main__":
    main()
