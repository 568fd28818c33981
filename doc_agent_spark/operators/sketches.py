"""Mergeable cardinality sketch: KMV (k-minimum-values) distinct count.

Why a sketch at 100 TB: exact countDistinct shuffles every distinct key;
a KMV sketch is k hashes per partition, merged by keeping the k smallest —
constant state per node, one tiny gather. Estimate: with u_k the k-th
smallest of the distinct values' uniform hashes, D̂ = (k-1)/u_k.

Why THIS sketch here: it is fully deterministic (md5-derived uniforms, no
RNG) and engine-portable, so the DuckDB oracle reproduces the sketch AND
the estimate bit-for-bit — approx sketches like HLL never survive an
exact-equality gate across engines. The Spark plan is the merge argument
made physical: per-partition k-min (partial TakeOrderedAndProject) →
single k-row merge, exactly how the sketch unions on a cluster.

Standard error ≈ 1/√(k-2): k=256 → ~6%.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def kmv_hash(value: Column, seed: str = "kmv") -> Column:
    """Deterministic U(0,1] hash: first 12 hex digits of md5(seed:value).
    12 digits (48 bits) keeps collisions negligible while conv() stays
    exact in a long; +1 avoids a zero divisor."""
    h = F.substring(F.md5(F.concat(F.lit(f"{seed}:"), value.cast("string"))), 1, 12)
    return (F.conv(h, 16, 10).cast("long").cast("double") + 1.0) / F.lit(float(16 ** 12))


def _kmv_partial(k: int):
    """Per-batch k smallest distinct hashes — the sketch's pre-shuffle
    reduction. Any hash among the GLOBAL k smallest distinct survives its
    batch's unique()[:k] (fewer than k distinct hashes can precede it), so
    the downstream merge over ≤k rows per batch is exact."""
    def gen(batches):
        import numpy as np
        import pandas as pd

        best = None
        for pdf in batches:
            u = np.unique(pdf["h"].to_numpy())
            best = u[:k] if best is None else np.unique(np.concatenate([best, u]))[:k]
        if best is not None and len(best):
            yield pd.DataFrame({"h": best})

    return gen


def kmv_distinct_estimate(
    df: DataFrame, value_col: str, k: int = 256, seed: str = "kmv",
    arrow_partial: bool = True,
) -> DataFrame:
    """One row: (k_used, kth_hash, estimate). If fewer than k distinct
    values exist the count is exact (estimate = n_hashes seen).

    ``arrow_partial=True`` (the sketch proper): each task reduces its rows
    to ≤k hashes BEFORE any exchange, so the shuffle is k rows per task no
    matter how many distinct values exist — the 100 TB shape. The
    relational fallback (distinct → TakeOrderedAndProject) shuffles one
    hash per distinct value: fine until distinct-count rivals corpus size.
    Both produce identical results (duplicates share a hash, and the
    per-batch k-min is a lossless reduction for the global k-min).
    """
    # NULL values hash to NULL (concat propagates) — drop them BEFORE the
    # sort: Spark asc sorts NULL first (it would steal a limit-k slot and
    # become NaN on the arrow path) while DuckDB sorts it last; standard
    # count-distinct ignores NULL, and both engines now filter identically
    h = df.select(kmv_hash(F.col(value_col), seed).alias("h")).filter(
        F.col("h").isNotNull()
    )
    if arrow_partial:
        h = h.mapInPandas(_kmv_partial(k), "h double")
    hashes = h.distinct().orderBy("h").limit(k)
    return hashes.agg(
        F.count(F.lit(1)).cast("int").alias("k_used"),
        F.round(F.max("h"), 12).alias("kth_hash"),
        F.round(
            F.when(
                F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double")
            ).otherwise((F.lit(float(k)) - 1.0) / F.max("h")),
            4,
        ).alias("estimate"),
    )


def kmv_sql(value_expr: str, k: int = 256, seed: str = "kmv") -> str:
    """DuckDB mirror of the sketch + estimate."""
    h = (
        f"(CAST(('0x' || substr(md5('{seed}:' || CAST({value_expr} AS VARCHAR)), 1, 12)) AS UBIGINT)"
        f" + 1.0) / {float(16 ** 12)!r}"
    )
    return f"""
WITH hs AS (SELECT DISTINCT {h} AS h FROM {{table}}
            WHERE {value_expr} IS NOT NULL ORDER BY h LIMIT {k})
SELECT CAST(count(*) AS INTEGER) AS k_used,
       round(max(h), 12) AS kth_hash,
       round(CASE WHEN count(*) < {k} THEN CAST(count(*) AS DOUBLE)
                  ELSE ({k} - 1.0) / max(h) END, 4) AS estimate
FROM hs
""".strip()


def kmv_overlap_estimate(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    k: int = 256,
    seed: str = "kmv",
    arrow_partial: bool = True,
) -> DataFrame:
    """KMV set-operation estimates between two keysets (Beyer et al.,
    SIGMOD 2007): union cardinality from the merged sketch's k-th smallest
    hash, intersection via the ρ-estimator — the fraction of the union's
    k-min hashes present in BOTH sides, scaled by the union estimate.
    The crawl-overlap primitive: "how many of this snapshot's URLs/users
    did the previous crawl already have" without joining two 10^12-row
    keysets — each side reduces to ≤k hashes per task before the exchange,
    and the merge is the same k-min that unions KMV sketches on a cluster.

    Membership flags are EXACT under per-side k-min truncation: any hash
    among the union's k smallest has fewer than k predecessors in either
    side, so it survives both sides' k-min reductions. When the union has
    fewer than k distinct values every count is exact (union_est = |A∪B|,
    inter rows = |A∩B|).

    Returns two rows ``(op, n long, est double, aux double)``:
    ('union', k_used, union_est, kth_hash) and
    ('intersection', n_both, inter_est, jaccard).
    """
    # NULLs out before any sort/merge — see kmv_distinct_estimate
    ha = df_a.select(kmv_hash(F.col(value_col), seed).alias("h")).filter(
        F.col("h").isNotNull()
    )
    hb = df_b.select(kmv_hash(F.col(value_col), seed).alias("h")).filter(
        F.col("h").isNotNull()
    )
    if arrow_partial:
        ha = ha.mapInPandas(_kmv_partial(k), "h double")
        hb = hb.mapInPandas(_kmv_partial(k), "h double")
    flagged = ha.distinct().select(
        "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b")
    ).unionByName(
        hb.distinct().select("h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
    )
    merged = (
        flagged.groupBy("h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
        .orderBy("h")
        .limit(k)
    )
    # one tiny aggregate over ≤k rows; expression order mirrored verbatim
    # in kmv_overlap_sql so IEEE doubles stay bit-identical across engines
    stats = merged.agg(
        F.count(F.lit(1)).alias("k_used"),
        F.max("h").alias("u"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("n_both"),
    )
    exact = F.col("k_used") < k
    union_est = F.when(exact, F.col("k_used").cast("double")).otherwise(
        (F.lit(float(k)) - 1.0) / F.col("u")
    )
    inter_est = F.when(exact, F.col("n_both").cast("double")).otherwise(
        ((F.lit(float(k)) - 1.0) / F.col("u"))
        * (F.col("n_both").cast("double") / F.col("k_used").cast("double"))
    )
    jacc = F.col("n_both").cast("double") / F.col("k_used").cast("double")
    return stats.select(
        F.expr(
            "stack(2, 'union', k_used, 'intersection', n_both)"
        ).alias("op", "n"),
        F.round(union_est, 4).alias("u_est"),
        F.round(inter_est, 4).alias("i_est"),
        F.round(F.col("u"), 12).alias("kth"),
        F.round(jacc, 6).alias("jc"),
    ).select(
        "op",
        "n",
        F.when(F.col("op") == "union", F.col("u_est")).otherwise(F.col("i_est")).alias("est"),
        F.when(F.col("op") == "union", F.col("kth")).otherwise(F.col("jc")).alias("aux"),
    )


def kmv_overlap_sql(
    a_query: str, b_query: str, value_expr: str = "v",
    k: int = 256, seed: str = "kmv",
) -> str:
    """DuckDB mirror of kmv_overlap_estimate: identical hash, k-min merge,
    flag algebra, and double-operation order. ``a_query``/``b_query`` are
    subqueries producing a ``{value_expr}`` column."""
    h = (
        f"(CAST(('0x' || substr(md5('{seed}:' || CAST({value_expr} AS VARCHAR)), 1, 12)) AS UBIGINT)"
        f" + 1.0) / {float(16 ** 12)!r}"
    )
    return f"""
WITH ha AS (SELECT DISTINCT {h} AS h FROM ({a_query}) WHERE {value_expr} IS NOT NULL),
hb AS (SELECT DISTINCT {h} AS h FROM ({b_query}) WHERE {value_expr} IS NOT NULL),
merged AS (
  SELECT h, max(in_a) AS in_a, max(in_b) AS in_b FROM (
    SELECT h, 1 AS in_a, 0 AS in_b FROM ha
    UNION ALL
    SELECT h, 0 AS in_a, 1 AS in_b FROM hb)
  GROUP BY h ORDER BY h LIMIT {k}),
stats AS (
  SELECT count(*) AS k_used, max(h) AS u, sum(in_a * in_b) AS n_both
  FROM merged),
rows_ AS (
  SELECT 'union' AS op, CAST(k_used AS BIGINT) AS n,
         round(CASE WHEN k_used < {k} THEN CAST(k_used AS DOUBLE)
                    ELSE ({k} - 1.0) / u END, 4) AS est,
         round(u, 12) AS aux
  FROM stats
  UNION ALL
  SELECT 'intersection', CAST(n_both AS BIGINT),
         round(CASE WHEN k_used < {k} THEN CAST(n_both AS DOUBLE)
                    ELSE (({k} - 1.0) / u)
                         * (CAST(n_both AS DOUBLE) / CAST(k_used AS DOUBLE)) END, 4),
         round(CAST(n_both AS DOUBLE) / CAST(k_used AS DOUBLE), 6)
  FROM stats)
SELECT * FROM rows_
""".strip()


def hash_sample_quantiles(
    df: DataFrame,
    value_col: str,
    key_col: str,
    group_col: str,
    m: int = 128,
    seed: str = "qsk",
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Quantile estimation over a deterministic bottom-m hash sample per
    group: rank rows by md5(key) within each group, keep the m smallest,
    take EXACT interpolated quantiles of the survivors. The per-group
    bottom-m is the KMV shape applied to sampling — a uniform m-subset
    that is (a) reproducible at any cluster size (content hash, no RNG,
    no data order), (b) mergeable (the bottom-m of a union is the
    bottom-m of the per-part bottom-m's — snapshot + delta compose), and
    (c) exact whenever a group has ≤ m rows. Unlike approx_percentile's
    GK sketch, the same rows are sampled on every engine, so the DuckDB
    oracle reproduces the estimate bit-for-bit.

    The rank filter compiles to WindowGroupLimit (per-group top-m pushed
    before the full sort), the same bounded-window discipline as
    cap_per_domain. ``key_col`` must be unique per row (md5 ties would
    make rank order nondeterministic).
    """
    h = kmv_hash(F.col(key_col), seed).alias("h")
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy("h")
    sampled = (
        df.select(group_col, value_col, h)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= m)
    )
    aggs = [
        F.round(F.percentile(value_col, F.lit(q)), 6).alias(f"p{int(round(q * 100))}")
        for q in quantiles
    ]
    return sampled.groupBy(group_col).agg(*aggs)


def hash_sample_quantiles_sql(
    table: str,
    value_expr: str,
    key_expr: str,
    group_expr: str,
    m: int = 128,
    seed: str = "qsk",
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> str:
    """DuckDB mirror: identical hash, per-group row_number bottom-m,
    quantile_cont (same linear interpolation as Spark's percentile)."""
    h = (
        f"(CAST(('0x' || substr(md5('{seed}:' || CAST({key_expr} AS VARCHAR)), 1, 12)) AS UBIGINT)"
        f" + 1.0) / {float(16 ** 12)!r}"
    )
    qs = ",\n       ".join(
        f"round(quantile_cont({value_expr}, {q}), 6) AS p{int(round(q * 100))}"
        for q in quantiles
    )
    return f"""
WITH ranked AS (
  SELECT {group_expr} AS grp, {value_expr},
         row_number() OVER (PARTITION BY {group_expr} ORDER BY {h}) AS rn
  FROM {table})
SELECT grp AS {group_expr}, {qs}
FROM ranked WHERE rn <= {m} GROUP BY grp
""".strip()


def cms_bucket(value: Column, row: int, width: int, seed: str = "cms") -> Column:
    """Deterministic bucket for counter row ``row``: 48 md5 bits mod width
    (md5 keeps the sketch bit-identical in the DuckDB oracle)."""
    h = F.substring(
        F.md5(F.concat(F.lit(f"{seed}:{row}:"), value.cast("string"))), 1, 12
    )
    return (F.conv(h, 16, 10).cast("long") % width).cast("int")


def cms_sketch(
    df: DataFrame, value_col: str, depth: int = 4, width: int = 64,
    seed: str = "cms",
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) as a counter table
    (row, bucket, c) — depth×width cells regardless of corpus size.

    100 TB shape: one narrow explode (depth rows per input row) into a
    map-side-partial hash aggregate whose key space is depth×width — the
    shuffle moves at most depth×width rows PER TASK, and sketches from
    different partitions/runs merge by adding counters (the same
    mergeability argument as the KMV sketch above)."""
    probes = df.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("row"),
                    cms_bucket(F.col(value_col), j, width, seed).alias("bucket"),
                )
                for j in range(depth)
            ])
        ).alias("p")
    ).select("p.row", "p.bucket")
    return probes.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("c"))


def cms_point_estimates(
    items: DataFrame, sketch: DataFrame, value_col: str,
    depth: int = 4, width: int = 64, seed: str = "cms",
) -> DataFrame:
    """Point-query frequencies: est(v) = min over rows of the counter at
    (row, bucket_row(v)) — always >= the true count (collisions only
    inflate). The sketch is depth×width rows -> broadcast; absent cells
    count 0 (possible when probing values never inserted)."""
    probes = items.select(
        F.col(value_col),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("row"),
                    cms_bucket(F.col(value_col), j, width, seed).alias("bucket"),
                )
                for j in range(depth)
            ])
        ).alias("p"),
    ).select(value_col, "p.row", "p.bucket")
    j = probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
    return j.groupBy(value_col).agg(
        F.min(F.coalesce(F.col("c"), F.lit(0))).alias("cms_est")
    )


def cms_sql(table: str, value_expr: str, depth: int = 4, width: int = 64,
            seed: str = "cms") -> str:
    """DuckDB mirror: (value, exact, est) per distinct value."""
    def bucket(j):
        return (
            f"CAST(('0x' || substr(md5('{seed}:{j}:' || CAST({value_expr} AS VARCHAR)), 1, 12)) "
            f"AS BIGINT) % {width}"
        )
    probe_rows = " UNION ALL ".join(
        f"SELECT {value_expr} AS v, {j} AS row, {bucket(j)} AS bucket FROM {table}"
        for j in range(depth)
    )
    return f"""
WITH px AS ({probe_rows}),
sk AS (SELECT row, bucket, count(*) AS c FROM px GROUP BY 1, 2),
qx AS (SELECT DISTINCT v, row, bucket FROM px),
est AS (SELECT v, min(coalesce(c, 0)) AS cms_est
        FROM qx LEFT JOIN sk USING (row, bucket) GROUP BY v),
exact AS (SELECT {value_expr} AS v, count(*) AS n FROM {table} GROUP BY 1)
SELECT exact.v AS v, exact.n AS n, est.cms_est AS cms_est
FROM exact JOIN est ON exact.v = est.v
""".strip()


def bloom_bit(value: Column, j: int, m_bits: int, seed: str = "bloom") -> Column:
    """Deterministic bit position for hash ``j``: 48 md5 bits mod m_bits
    (same md5→conv scheme as kmv_hash/cms_bucket, so the DuckDB oracle
    reproduces every position bit-for-bit)."""
    h = F.substring(
        F.md5(F.concat(F.lit(f"{seed}:{j}:"), value.cast("string"))), 1, 12
    )
    return F.conv(h, 16, 10).cast("long") % m_bits


def _bloom_probes(df: DataFrame, value_col: str, m_bits: int, n_hashes: int,
                  seed: str) -> DataFrame:
    """One row per (input row, hash j): the exploded probe positions."""
    return df.withColumn(
        "bit",
        F.explode(F.array(*[
            bloom_bit(F.col(value_col), j, m_bits, seed) for j in range(n_hashes)
        ])),
    )


def bloom_build(df: DataFrame, value_col: str, m_bits: int = 16384,
                n_hashes: int = 3, seed: str = "bloom") -> DataFrame:
    """Bloom filter (Bloom 1970) as a packed word table ``(word int,
    mask long)`` — at most m_bits/32 rows regardless of corpus size.

    100 TB shape: the incremental-crawl dedup primitive — membership of a
    10^12-key history snapshot compressed to a broadcastable constant-size
    side (m_bits/32 rows ≈ 12 B each), so a new crawl batch is probed with
    a broadcast join instead of shuffling the full history. The filter is
    MERGEABLE exactly like the KMV/CMS sketches above: filters from
    different partitions, days, or snapshots union via
    ``groupBy(word).agg(bit_or(mask))`` — the same bit_or this builder
    runs as its map-side-partial aggregate. Masks stay in [0, 2^32): bits
    pack 32 per word so no shift reaches the long sign bit, keeping the
    arithmetic portable to the DuckDB oracle (bloom_sql)."""
    bits = _bloom_probes(df, value_col, m_bits, n_hashes, seed)
    return bits.groupBy(F.expr("cast(bit div 32 as int)").alias("word")).agg(
        F.expr("bit_or(shiftleft(cast(1 as bigint), cast(bit % 32 as int)))").alias("mask")
    )


def bloom_probe(df: DataFrame, words: DataFrame, id_col: str, value_col: str,
                m_bits: int = 16384, n_hashes: int = 3,
                seed: str = "bloom") -> DataFrame:
    """Probe each row of ``df`` against a built filter: ``(id, value,
    maybe_seen)`` where maybe_seen ⇔ all n_hashes probe bits are set.

    No false negatives (a key inserted by bloom_build always probes true);
    false positives at the classic (1 - e^(-kn/m))^k rate — deterministic
    given the corpus, so the oracle reproduces even the collisions. The
    join side is the constant-size word table, broadcast; the probe frame
    is a narrow explode (n_hashes rows per doc) aggregated straight back
    by (id, value) with a map-side partial min."""
    probes = (
        _bloom_probes(df.select(id_col, value_col), value_col, m_bits, n_hashes, seed)
        .withColumn("word", F.expr("cast(bit div 32 as int)"))
        .withColumn("pmask", F.expr("shiftleft(cast(1 as bigint), cast(bit % 32 as int))"))
    )
    j = probes.join(F.broadcast(words), "word", "left")
    hit = F.when(
        F.col("mask").isNotNull() & (F.col("mask").bitwiseAND(F.col("pmask")) != 0),
        1,
    ).otherwise(0)
    return (
        j.groupBy(id_col, value_col)
        .agg((F.min(hit) == 1).alias("maybe_seen"))
    )


def bloom_sql(hist: str, batch: str, value_expr: str, id_expr: str,
              m_bits: int = 16384, n_hashes: int = 3,
              seed: str = "bloom") -> str:
    """DuckDB mirror of bloom_build + bloom_probe: (id, value, maybe_seen)
    for every row of ``batch`` probed against a filter built over ``hist``
    (both are CTE names in the enclosing query)."""
    js = ", ".join(str(j) for j in range(n_hashes))
    bit = (
        f"CAST(('0x' || substr(md5('{seed}:' || CAST(j AS VARCHAR) || ':' "
        f"|| CAST({value_expr} AS VARCHAR)), 1, 12)) AS BIGINT) % {m_bits}"
    )
    return f"""
hbits AS (SELECT DISTINCT {bit} AS bit
          FROM {hist} CROSS JOIN (SELECT unnest([{js}]) AS j)),
words AS (SELECT bit // 32 AS word,
                 bit_or(1::BIGINT << CAST(bit % 32 AS INT)) AS mask
          FROM hbits GROUP BY 1),
probes AS (SELECT {id_expr} AS pid, {value_expr} AS pval, {bit} AS bit
           FROM {batch} CROSS JOIN (SELECT unnest([{js}]) AS j)),
probed AS (SELECT pid, pval,
                  min(CASE WHEN coalesce(mask, 0)
                            & (1::BIGINT << CAST(bit % 32 AS INT)) <> 0
                           THEN 1 ELSE 0 END) = 1 AS maybe_seen
           FROM probes LEFT JOIN words ON probes.bit // 32 = words.word
           GROUP BY 1, 2)
""".strip()


# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet 2007) — deterministic, oracle-exact variant
# ---------------------------------------------------------------------------

_HLL_B = 8                      # 2^8 = 256 registers
_HLL_M = 1 << _HLL_B
_HLL_W_BITS = 60 - _HLL_B       # rank source width (60-bit md5 prefix)
_HLL_R = _HLL_W_BITS + 1        # max possible rank (w == 0)
# alpha_m for m = 256 (Flajolet 2007 §4); repr'd into both engines' SQL so
# the constant is the identical double on each side.
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / _HLL_M)
# numerator alpha * m^2 * 2^R precomputed in Python: one double, exact 2^R
# scaling, so estimate = NUM / S is a single deterministic IEEE division.
_HLL_NUM = _HLL_ALPHA * float(_HLL_M * _HLL_M) * float(2 ** _HLL_R)


def hll_registers(df: DataFrame, value_col: str, seed: str = "hll") -> DataFrame:
    """Register table ``(bucket int, rank int)`` — ≤ m = 256 rows.

    Deterministic HLL: 60-bit md5 prefix h; bucket = low 8 bits, rank =
    leading-zero count of the remaining 52 bits + 1 (via the binary-string
    length, portable to DuckDB's identical ``bin()``), register = max rank
    per bucket. The groupBy(max) is map-side partial — each task reduces to
    ≤256 rows before the exchange — and two register tables (partitions,
    days, snapshot + delta) merge by the same per-bucket max, the
    mergeability contract shared by the KMV/CMS/Bloom sketches above.
    """
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:"), F.col(value_col).cast("string"))), 1, 15),
        16, 10,
    ).cast("long")
    w = F.shiftright(h, _HLL_B)
    rank = F.when(w == 0, F.lit(_HLL_R)).otherwise(
        F.lit(_HLL_R) - F.length(F.bin(w))
    ).cast("int")
    probes = df.select(
        h.bitwiseAND(F.lit(_HLL_M - 1)).cast("int").alias("bucket"),
        rank.alias("rank"),
    )
    return probes.groupBy("bucket").agg(F.max("rank").alias("rank"))


def hll_distinct_estimate(df: DataFrame, value_col: str, seed: str = "hll") -> DataFrame:
    """One row: ``(m_used int, zeros int, s_scaled bigint, estimate double)``.

    Estimate = alpha·m²/Σ 2^(−M_j) with the harmonic sum kept EXACT: every
    term 2^(−M_j) is scaled by 2^R (R = 53) into an integer 2^(R−M_j), so
    Σ is a bigint (≤ m·2^R < 2^62) and no float-summation order can differ
    between engines — the one place a naive HLL port loses bit-equality.
    Empty buckets contribute 2^R each (rank 0). The raw estimate is left
    uncorrected (no log-based linear counting in the data plane — ln(x)
    is libm-dependent across engines); ``zeros`` rides along so a consumer
    applies Flajolet's small-range correction driver-side when
    estimate < 2.5·m and zeros > 0 (see tests/test_sketches.py).
    """
    regs = hll_registers(df, value_col, seed)
    return regs.agg(
        F.count(F.lit(1)).cast("int").alias("m_used"),
        (F.lit(_HLL_M) - F.count(F.lit(1))).cast("int").alias("zeros"),
        (
            F.sum(F.expr(f"shiftleft(cast(1 as bigint), {_HLL_R} - rank)"))
            + (F.lit(_HLL_M) - F.count(F.lit(1))).cast("long") * F.lit(2 ** _HLL_R).cast("long")
        ).alias("s_scaled"),
    ).select(
        "m_used", "zeros", "s_scaled",
        F.round(F.lit(_HLL_NUM) / F.col("s_scaled").cast("double"), 3).alias("estimate"),
    )


def hll_sql(value_expr: str, seed: str = "hll") -> str:
    """DuckDB mirror of hll_registers + hll_distinct_estimate over
    ``{table}``: same md5 prefix, same bucket/rank bit algebra, same exact
    integer harmonic sum, same single rounded division."""
    h = f"CAST(('0x' || substr(md5('{seed}:' || CAST({value_expr} AS VARCHAR)), 1, 15)) AS BIGINT)"
    return f"""
WITH hh AS (SELECT {h} AS h FROM {{table}}),
regs AS (SELECT CAST(h & {_HLL_M - 1} AS INTEGER) AS bucket,
                max(CASE WHEN (h >> {_HLL_B}) = 0 THEN {_HLL_R}
                         ELSE {_HLL_R} - length(bin(h >> {_HLL_B})) END) AS rank
         FROM hh GROUP BY 1)
SELECT CAST(count(*) AS INTEGER) AS m_used,
       CAST({_HLL_M} - count(*) AS INTEGER) AS zeros,
       CAST(sum(1::BIGINT << ({_HLL_R} - rank))
            + ({_HLL_M} - count(*)) * {2 ** _HLL_R}::BIGINT AS BIGINT) AS s_scaled,
       round({_HLL_NUM!r} / CAST(sum(1::BIGINT << ({_HLL_R} - rank))
            + ({_HLL_M} - count(*)) * {2 ** _HLL_R}::BIGINT AS DOUBLE), 3) AS estimate
FROM regs
""".strip()
