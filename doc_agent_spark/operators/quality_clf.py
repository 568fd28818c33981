"""Hashed Naive-Bayes text classifier — the model-based quality-filter
stand-in (DCLM / FineWeb-Edu style classifier filtering, fastText's
linear-model-over-hashed-ngrams shape) with a deterministic, engine-
portable trainer.

Why NB and not logistic regression: the classifier-filter pattern at
100 TB is (1) train a small linear model on a labeled slice, (2) score
every document with it, (3) keep docs above a threshold. Naive Bayes is
the one linear model whose TRAINING is a single aggregation pass — no
iterations, no RNG, no learning rate — so the whole train+score pipeline
is expressible as three hash aggregates and stays bit-reproducible across
engines (the DuckDB oracle re-trains the identical model).

Feature hashing (Weinberger et al. 2009): tokens hash to ``n_buckets``
ids via the repo-standard 48-bit md5 scheme, so the model is a fixed-size
table regardless of vocabulary — the property that makes the model
broadcastable at any corpus size.

Scale shape:
- training: explode tokens -> groupBy(bucket) counts. Shuffle keys are
  8-byte bucket ids with at most 2·n_buckets rows per task after the
  map-side partial — constant, not corpus-sized.
- model: n_buckets rows, broadcast to the scoring join (a few KB).
- scoring: the same exploded frame joins the broadcast model and
  re-groups by doc id (map-side partial sum) — one shuffle of
  (doc_id, partial_sum) pairs, no model-sized state per executor beyond
  the broadcast.

Cross-engine float discipline: per-token log-odds are ln() of identical
IEEE doubles in both engines (exact-integer ratios), summed per doc and
rounded to 6 decimals — the same tolerance the CCNet bigram-LM arm uses
(lm_quality.py precedent) to absorb last-ulp libm and sum-order drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from doc_agent_spark.functions.textfns import words_of


def _bucket(w: Column, n_buckets: int, seed: str) -> Column:
    h = F.substring(F.md5(F.concat(F.lit(f"{seed}:"), w)), 1, 12)
    return F.conv(h, 16, 10).cast("long") % n_buckets


def hashed_nb_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label: Column,
    n_buckets: int = 4096,
    seed: str = "nbq",
    tokens_col: str | None = None,
) -> DataFrame:
    """Train a hashed-NB model on ``df`` (binary ``label``) and score every
    row with it: ``(id, nb_score, nb_pred)``.

    nb_score = sum over tokens of
        ln((c_pos(b)+1)/(n_pos+V)) - ln((c_neg(b)+1)/(n_neg+V))
      + ln(d_pos/d_neg)                       (doc-count class prior)
    rounded to 6 decimals; nb_pred = rounded score > 0. Add-one smoothing
    with V = n_buckets keeps every bucket's odds finite.
    """
    tok_arr = F.col(tokens_col) if tokens_col else words_of(F.col(text_col))
    toks = (
        df.select(
            F.col(id_col).alias("id"), label.alias("y"),
            F.explode(tok_arr).alias("w"),
        )
        .withColumn("bucket", _bucket(F.col("w"), n_buckets, seed))
        .drop("w")
        # three downstream actions branch off this frame (model counts,
        # token totals, scoring); without a checkpoint each would re-run
        # the tokenize+hash scan — the conversion_funnel recompute lesson.
        # The frame is (id, bool, long): far smaller than the text it came
        # from, so materializing it is the cheap side of the trade.
        .localCheckpoint(eager=True)
    )
    model = toks.groupBy("bucket").agg(
        F.sum(F.when(F.col("y"), 1).otherwise(0)).cast("long").alias("c_pos"),
        F.sum(F.when(~F.col("y"), 1).otherwise(0)).cast("long").alias("c_neg"),
    )
    tok_tot = toks.agg(
        F.sum(F.when(F.col("y"), 1).otherwise(0)).cast("long").alias("n_pos"),
        F.sum(F.when(~F.col("y"), 1).otherwise(0)).cast("long").alias("n_neg"),
    )
    doc_tot = df.agg(
        F.sum(F.when(label, 1).otherwise(0)).cast("long").alias("d_pos"),
        F.sum(F.when(~label, 1).otherwise(0)).cast("long").alias("d_neg"),
    )
    log_odds = model.crossJoin(F.broadcast(tok_tot)).select(
        "bucket",
        (
            F.log((F.col("c_pos") + 1).cast("double")
                  / (F.col("n_pos") + n_buckets).cast("double"))
            - F.log((F.col("c_neg") + 1).cast("double")
                    / (F.col("n_neg") + n_buckets).cast("double"))
        ).alias("log_odds"),
    )
    # every scored bucket exists in the model (trained on the same tokens),
    # so the join never nulls; docs with zero tokens fall out of `toks` and
    # re-enter with the bare prior via the left join below.
    scored = (
        toks.join(F.broadcast(log_odds), "bucket")
        .groupBy("id")
        .agg(F.sum("log_odds").alias("_s"))
    )
    prior = F.log(F.col("d_pos").cast("double") / F.col("d_neg").cast("double"))
    return (
        df.select(F.col(id_col).alias("id"))
        .join(scored, "id", "left")
        .crossJoin(F.broadcast(doc_tot))
        .select(
            "id",
            F.round(F.coalesce(F.col("_s"), F.lit(0.0)) + prior, 6).alias("nb_score"),
        )
        .withColumn("nb_pred", F.col("nb_score") > 0)
    )


def hashed_nb_sql(
    table: str,
    id_expr: str,
    words_expr: str,
    label_expr: str,
    n_buckets: int = 4096,
    seed: str = "nbq",
) -> str:
    """DuckDB mirror as a CTE chain ending in
    ``nbsc(id, nb_score, nb_pred)`` — splice after a ``WITH``."""
    bucket = (
        f"CAST(('0x' || substr(md5('{seed}:' || w), 1, 12)) AS BIGINT) % {n_buckets}"
    )
    return f"""
nbt AS (SELECT {id_expr} AS id, {label_expr} AS y, unnest({words_expr}) AS w
        FROM {table}),
nbb AS (SELECT id, y, {bucket} AS bucket FROM nbt),
nbm AS (SELECT bucket,
               sum(CASE WHEN y THEN 1 ELSE 0 END) AS c_pos,
               sum(CASE WHEN NOT y THEN 1 ELSE 0 END) AS c_neg
        FROM nbb GROUP BY 1),
nbtot AS (SELECT sum(CASE WHEN y THEN 1 ELSE 0 END) AS n_pos,
                 sum(CASE WHEN NOT y THEN 1 ELSE 0 END) AS n_neg
          FROM nbb),
nbd AS (SELECT sum(CASE WHEN {label_expr} THEN 1 ELSE 0 END) AS d_pos,
               sum(CASE WHEN NOT ({label_expr}) THEN 1 ELSE 0 END) AS d_neg
        FROM {table}),
nblo AS (SELECT bucket,
                ln(CAST(c_pos + 1 AS DOUBLE) / CAST(n_pos + {n_buckets} AS DOUBLE))
              - ln(CAST(c_neg + 1 AS DOUBLE) / CAST(n_neg + {n_buckets} AS DOUBLE))
                AS log_odds
         FROM nbm CROSS JOIN nbtot),
nbsum AS (SELECT id, sum(log_odds) AS s
          FROM nbb JOIN nblo USING (bucket) GROUP BY id),
nbsc AS (SELECT {id_expr} AS id,
                round(coalesce(s, 0.0)
                      + ln(CAST(d_pos AS DOUBLE) / CAST(d_neg AS DOUBLE)), 6)
                  AS nb_score,
                round(coalesce(s, 0.0)
                      + ln(CAST(d_pos AS DOUBLE) / CAST(d_neg AS DOUBLE)), 6) > 0
                  AS nb_pred
         FROM {table}
         LEFT JOIN nbsum ON {id_expr} = nbsum.id
         CROSS JOIN nbd)
""".strip()
