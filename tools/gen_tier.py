"""Synthesize a larger test tier with the driver-testdata schemas.

The driver ships sf0.001/0.01/0.1 only (TESTDATA.md) and /root/testdata is
read-only, so the sf1.0 scale proof (r4 verdict #1) generates its own tier.
The oracle gate compares Spark vs DuckDB over the SAME parquet files, so the
tier only needs to be schema-identical and distribution-faithful to the
driver's tables — it does not need to reproduce the driver's exact rows.
Schemas, key ranges, category vocabularies, and the documents word vocabulary
were measured off sf0.01/sf0.1 (see BASELINE.md §7); everything is
numpy-vectorized and seeded, so the tier is reproducible byte-for-byte.

Usage: python tools/gen_tier.py <out_dir> [sf]        (default sf=1.0)

Row counts scale linearly off the driver's sf0.1 counts (lineitem 6M at
sf1.0); nation/region stay fixed like TPC-H.
"""

from __future__ import annotations

import math
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# measured off the driver tiers (same lists the sf0.01 tables contain)
VOCAB = np.array([
    "join", "hash", "row", "batch", "scan", "column", "customer", "filter",
    "small", "slow", "merge", "order", "vector", "line", "data", "table",
    "agg", "value", "key", "stream", "window", "spark", "a", "group", "part",
    "big", "sort", "query", "fast", "the",
])
LANGS = np.array(["en", "zh", "es", "de", "fr"])
LANG_P = np.array([0.44, 0.15, 0.145, 0.14, 0.125])
LANG_P = LANG_P / LANG_P.sum()
SEGMENTS = np.array(["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"])
STATUSES = np.array(["O", "F", "P"])
PRIORITIES = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])
EVENT_TYPES = np.array(["click", "view", "signup", "purchase", "error"])
P_ADJ = np.array(["small", "large", "red", "blue", "hot", "old", "new"])
P_NOUN = np.array(["ring", "widget", "bolt", "gear", "gizmo", "plate", "anvil"])
P_TYPES = np.array(["ECONOMY", "MEDIUM", "SMALL", "PROMO", "STANDARD", "LARGE"])
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]

EPOCH_1995 = np.datetime64("1995-01-01")
EPOCH_2024 = np.datetime64("2024-01-01")


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def gen_tier(out_dir: str, sf: float = 1.0, seed: int = 7) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_evt = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    n_docs = int(50_000 * sf)
    # the driver's own embeddings curve is SUBLINEAR (500 @ sf0.01 →
    # 2000 @ sf0.1: ×4 per decade, not ×10) — follow it so vector entries
    # keep the same relative weight the shipped tiers have
    n_vecs = int(round(500 * 4 ** (math.log10(sf / 0.01))))

    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": pa.array(REGIONS),
    }))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": pa.array(SEGMENTS[rng.integers(0, 5, n_cust)]),
    }))

    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))

    adj = P_ADJ[rng.integers(0, len(P_ADJ), n_part)]
    noun = P_NOUN[rng.integers(0, len(P_NOUN), n_part)]
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": pa.array(np.char.add(np.char.add(adj, " "), noun)),
        "p_brand": pa.array([f"Brand#{i}" for i in rng.integers(1, 26, n_part)]),
        "p_type": pa.array(P_TYPES[rng.integers(0, len(P_TYPES), n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(900.0 + (np.arange(n_part) % 1000) / 10.0, 2),
    }))

    odate = EPOCH_1995 + rng.integers(0, 2405, n_ord).astype("timedelta64[D]")
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(STATUSES[rng.integers(0, 3, n_ord)]),
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": pa.array(odate.astype("datetime64[us]")),
        "o_orderpriority": pa.array(PRIORITIES[rng.integers(0, 5, n_ord)]),
    }))

    # ~4 lines/order like the driver tiers (1..7 uniform)
    nlines = rng.integers(1, 8, n_ord)
    okey = np.repeat(np.arange(n_ord), nlines)
    n_li = len(okey)
    linenum = np.arange(n_li) - np.repeat(np.cumsum(nlines) - nlines, nlines) + 1
    qty = rng.integers(1, 51, n_li).astype("float64")
    price = np.round(rng.uniform(900, 2100, n_li) * qty, 2)
    ship = np.repeat(odate, nlines) + rng.integers(1, 122, n_li).astype("timedelta64[D]")
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(okey, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(linenum, pa.int32()),
        "l_quantity": qty,
        "l_extendedprice": price,
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(["O", "F"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": pa.array(ship.astype("datetime64[us]")),
    }))

    ts = EPOCH_2024 + rng.integers(0, 30 * 86_400_000_000, n_evt).astype(
        "timedelta64[us]"
    )
    ts = np.sort(ts)
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(n_evt), pa.int64()),
        "ts": pa.array(ts),
        "user_id": pa.array(rng.integers(0, n_users, n_evt), pa.int64()),
        "event_type": pa.array(EVENT_TYPES[rng.integers(0, 5, n_evt)]),
        "value": np.round(rng.exponential(60.0, n_evt) + 0.01, 2),
        "props": pa.array([f'{{"k": {k}}}' for k in rng.integers(0, 100, n_evt)]),
    }))

    # documents: word sequences off the measured vocab; ~5% carry the rare
    # 'dup' token like the driver tier; n_chars == len(text) invariant holds
    doc_lens = rng.integers(10, 106, n_docs)
    words = VOCAB[rng.integers(0, len(VOCAB), doc_lens.sum())]
    bounds = np.cumsum(doc_lens)[:-1]
    texts = [" ".join(chunk) for chunk in np.split(words, bounds)]
    dup_mask = rng.random(n_docs) < 0.05
    texts = [t + " dup" if d else t for t, d in zip(texts, dup_mask)]
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_docs), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(LANGS[rng.choice(len(LANGS), n_docs, p=LANG_P)]),
        "source": pa.array([f"src{i}" for i in rng.integers(0, 20, n_docs)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    # unit-norm 64-dim float32 with a mild label pull (driver vectors are
    # unit-norm; within-label cosine is near zero, so keep the pull small)
    labels = rng.integers(0, 10, n_vecs).astype("int32")
    centroids = rng.standard_normal((10, 64)).astype("float32")
    centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)
    vecs = rng.standard_normal((n_vecs, 64)).astype("float32")
    vecs += 0.15 * centroids[labels]
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_vecs), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }))


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    print(f"generating sf={sf} tier -> {out}")
    gen_tier(out, sf)
    print("done")
