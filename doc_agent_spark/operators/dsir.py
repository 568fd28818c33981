"""DSIR — Data Selection via Importance Resampling (Xie et al., 2023,
arXiv:2302.03169).

The standard "make the raw crawl look like a trusted target corpus"
selector: fit two bag-of-hashed-n-gram models — p over a small target
set (the Wikipedia/books stand-in), q over the raw pool — and score
every raw document with the importance log-weight

    log w(x) = Σ_b  count_b(x) · ( ln p_b − ln q_b )

where count_b(x) is the document's hashed unigram+bigram count in
bucket b and p, q are Laplace-smoothed bucket distributions. Selection
is Gumbel top-k: drawing k documents without replacement with
probability ∝ w(x) is equivalent to ranking by log w(x) + Gumbel noise
and keeping the top k (the Gumbel-max trick; Vieira 2014); the noise
here derives from the document's content hash, so the "random" draw is
bit-reproducible at any cluster size and partition layout.

The reference has no data-selection stage at all (one document at a
time, no corpus view — packages/extract/src/extract.ts:11-35); this is
part of the corpus-curation layer a 100 TB training pipeline needs on
top of the reference's per-document semantics, alongside the NB
classifier filter (quality_clf.py) and the CCNet LM (lm_quality.py).

Model semantics (pinned; mirrored 1:1 by the DuckDB oracle arm in
``__spark_entry__.oracle_sql()['deterministic_samples']``):

- tokens = ``textfns.words_of`` (the repo's shared tokenizer);
- features per doc = all unigram occurrences + all adjacent-bigram
  occurrences (bigram spelled ``w1 || ' ' || w2``) — counts, NOT a
  distinct set (DSIR's feature is a count vector);
- bucket(g) = repo-standard 48-bit md5 hash of ``"<seed>:" || g``
  mod ``n_buckets`` (same scheme as quality_clf._bucket);
- ln p_b = ln(c_p(b) + 1) − ln(T_p + B)  (add-one smoothing, so buckets
  unseen in the target still score the finite floor −ln(T_p + B));
  ln q_b likewise — q is fit on the scored pool itself, so every
  scored bucket exists in q;
- log w(doc) = Σ count·(ln p_b − ln q_b), the FINAL sum rounded to 6
  decimals on both engines (summation-order fp noise ~1e-12 vs the
  1e-6 grid — the lm_quality.py discipline); token-free docs score 0;
- Gumbel key = round(logw + (−ln(−ln(u))), 6) with
  u = (hash8-int(id) + 0.5) / 16^8 ∈ (0, 1); top-k by key DESC, id ASC.

Scale shape (the quality_clf.py pattern):
- the exploded (id, bucket) frame is localCheckpoint'ed once — three
  downstream actions (q-model, q-total, scoring) branch off it, and the
  frame is (id, long), far smaller than the text it came from;
- both models are hash aggregates keyed on 8-byte bucket ids, at most
  B rows per task after the map-side partial — constant-size shuffles;
- models broadcast to the scoring join; the per-doc sum's shuffle rows
  are (id, partial-sum) pairs;
- Gumbel top-k is orderBy+limit = TakeOrderedAndProject (per-partition
  heads only cross the wire).
No Python anywhere; every expression is codegen'd. At 100 TB the target
model is corpus-stat state: persist its ≤B rows once (the
jobs/curate.py artifact pattern) and reuse across incremental runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from doc_agent_spark.functions.textfns import words_of

_HEX8_SPAN = float(16 ** 8)


def _bucket(g: Column, n_buckets: int, seed: str) -> Column:
    h = F.substring(F.md5(F.concat(F.lit(f"{seed}:"), g)), 1, 12)
    return F.conv(h, 16, 10).cast("long") % n_buckets


def hashed_ngram_buckets(
    docs: DataFrame,
    n_buckets: int,
    id_col: str = "id",
    text_col: str = "text",
    seed: str = "dsir42",
) -> DataFrame:
    """(id, bucket) — one row per unigram/bigram OCCURRENCE (the hashed
    count vector, exploded). Token-free docs emit no rows."""
    ws = words_of(F.col(text_col))
    n = F.greatest(F.size(ws) - F.lit(1), F.lit(0))
    bigrams = F.zip_with(
        F.slice(ws, 1, n), F.slice(ws, 2, n),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.concat(ws, bigrams)).alias("g"),
    ).select("id", _bucket(F.col("g"), n_buckets, seed).alias("bucket"))


def _log_probs(
    toks: DataFrame, n_buckets: int, p_col: str, t_col: str
) -> DataFrame:
    """Laplace-smoothed log bucket distribution of an exploded (id, bucket)
    frame: (bucket, <p_col>) plus the total-mass column <t_col> riding every
    row so the scorer can build the absent-bucket floor without another
    pass. ≤ n_buckets rows."""
    tot = toks.agg(F.count(F.lit(1)).cast("long").alias(t_col))
    return (
        toks.groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            (F.log((F.col("c") + 1).cast("double"))
             - F.log((F.col(t_col) + n_buckets).cast("double"))).alias(p_col),
            t_col,
        )
    )


def importance_log_weights(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = 4096,
    id_col: str = "id",
    text_col: str = "text",
    seed: str = "dsir42",
) -> DataFrame:
    """(id, logw) for every raw document — one row per input row, logw
    rounded to 6 decimals, token-free docs at 0.0."""
    toks = hashed_ngram_buckets(
        raw, n_buckets, id_col, text_col, seed
    ).localCheckpoint(eager=True)  # q-model, q-total and scoring branch here
    p = _log_probs(
        hashed_ngram_buckets(target, n_buckets, id_col, text_col, seed),
        n_buckets, "lp", "t_p",
    )
    q = _log_probs(toks, n_buckets, "lq", "t_q")
    # every scored bucket exists in q (fit on the same tokens); buckets the
    # TARGET never saw take the smoothing floor ln(1) - ln(T_p + B), built
    # from the t_p total that rides the q-side join when the p-side nulls.
    # agg-on-possibly-empty: a token-free target yields one NULL row, not
    # zero rows (a zero-row frame would silently empty the crossJoin below)
    t_p = p.agg(F.coalesce(F.first("t_p"), F.lit(0)).alias("t_p"))
    floor_p = -F.log((F.col("t_p") + n_buckets).cast("double"))
    scored = (
        toks.groupBy("id", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .join(F.broadcast(p.drop("t_p")), "bucket", "left")
        .join(F.broadcast(q.drop("t_q")), "bucket")
        .crossJoin(F.broadcast(t_p))
        .groupBy("id")
        .agg(
            F.sum(
                F.col("cnt") * (F.coalesce(F.col("lp"), floor_p) - F.col("lq"))
            ).alias("_s")
        )
    )
    return (
        raw.select(F.col(id_col).alias("id"))
        .join(scored, "id", "left")
        .select("id", F.round(F.coalesce(F.col("_s"), F.lit(0.0)), 6).alias("logw"))
    )


def gumbel_key(logw: Column, id_: Column, seed: str = "gumbel42") -> Column:
    """round(logw + Gumbel(0,1) noise, 6) with the noise drawn from the
    document's content-hash uniform — the deterministic resampling key."""
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{seed}:"), id_.cast("string"))), 1, 8
            ),
            16, 10,
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(_HEX8_SPAN)
    return F.round(logw + (-F.log(-F.log(u))), 6)


def dsir_sql(
    table: str,
    id_expr: str,
    words_expr: str,
    target_pred: str,
    k: int,
    n_buckets: int = 4096,
    seed: str = "dsir42",
    gumbel_seed: str = "gumbel42",
) -> str:
    """DuckDB mirror of :func:`dsir_select` as a complete SELECT returning
    ``(id, logw)`` for the k Gumbel-top-k documents of ``table`` scored
    against the ``target_pred`` subset. Expression-for-expression the same
    double math as the Spark plan (two-ln Laplace form, final round-6,
    hash-uniform Gumbel key)."""
    b = n_buckets
    bucket = (
        f"CAST(('0x' || substr(md5('{seed}:' || g), 1, 12)) AS BIGINT) % {b}"
    )
    u = (
        f"(CAST(('0x' || substr(md5('{gumbel_seed}:' || CAST(id AS VARCHAR)), 1, 8)) "
        f"AS BIGINT) + 0.5) / {_HEX8_SPAN!r}"
    )
    return f"""
WITH dwrds AS (SELECT {id_expr} AS id, {words_expr} AS w, ({target_pred}) AS is_t
               FROM {table}),
dfeat AS (SELECT id, is_t, {bucket} AS bucket
          FROM (SELECT id, is_t, unnest(list_concat(w,
                  list_transform(range(1, greatest(len(w) - 1, 0) + 1),
                                 i -> w[i] || ' ' || w[i+1]))) AS g
                FROM dwrds)),
dq AS (SELECT bucket, count(*) AS c FROM dfeat GROUP BY 1),
dqt AS (SELECT count(*) AS t FROM dfeat),
dp AS (SELECT bucket, count(*) AS c FROM dfeat WHERE is_t GROUP BY 1),
dpt AS (SELECT count(*) AS t FROM dfeat WHERE is_t),
ddc AS (SELECT id, bucket, count(*) AS cnt FROM dfeat GROUP BY 1, 2),
dsum AS (SELECT ddc.id AS did,
           sum(CAST(cnt AS DOUBLE) * (
               coalesce(ln(CAST(dp.c + 1 AS DOUBLE)) - ln(CAST(dpt.t + {b} AS DOUBLE)),
                        -ln(CAST(dpt.t + {b} AS DOUBLE)))
             - (ln(CAST(dq.c + 1 AS DOUBLE)) - ln(CAST(dqt.t + {b} AS DOUBLE))))) AS s
         FROM ddc JOIN dq USING (bucket) LEFT JOIN dp USING (bucket)
         CROSS JOIN dpt CROSS JOIN dqt
         GROUP BY ddc.id),
dsirw AS (SELECT {id_expr} AS id, round(coalesce(s, 0.0), 6) AS logw
          FROM {table} LEFT JOIN dsum ON {id_expr} = dsum.did),
dsirkey AS (SELECT id, logw, round(logw + (-ln(-ln({u}))), 6) AS key FROM dsirw)
SELECT id, logw FROM dsirkey ORDER BY key DESC, id LIMIT {k}
""".strip()


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    n_buckets: int = 4096,
    id_col: str = "id",
    text_col: str = "text",
    seed: str = "dsir42",
    gumbel_seed: str = "gumbel42",
) -> DataFrame:
    """The full DSIR stage: importance weights + Gumbel top-k resample.
    Returns (id, logw, key) for the k selected documents — orderBy+limit,
    so the plan is TakeOrderedAndProject (no global sort materializes)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = importance_log_weights(raw, target, n_buckets, id_col, text_col, seed)
    return (
        w.withColumn("key", gumbel_key(F.col("logw"), F.col("id"), gumbel_seed))
        .orderBy(F.desc("key"), F.col("id"))
        .limit(k)
    )
