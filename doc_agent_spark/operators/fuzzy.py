"""Fuzzy string matching via deletion neighborhoods (the SymSpell
indexing idea, Garbe 2012): two strings within Levenshtein distance 1
ALWAYS share at least one member of their 1-deletion neighborhoods
(the string itself plus every single-character deletion), so an
equi-join on neighborhood keys generates every candidate pair at
O(N·L) index size — never the O(N²) cross join — and the built-in
``levenshtein`` (JVM codegen in Spark, native in DuckDB) verifies.

The reference-domain use is field-value entity resolution: 'ACME Corp'
vs 'ACME Cor' vs 'ACME Corpx' from different extractions of the same
vendor (normalize.ts's vendor coalesce assumes the values already
agree; this is the step that makes them agree).

Scale shape: generate-then-verify like every dedup family here — keys
are short strings, the join is an equi-join (AQE-compactable), verify
runs only on candidates, and the dictionary side is typically
broadcastable (a vendor list, not a corpus).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_variants(c: Column) -> Column:
    """array<string>: the string plus each single-character deletion
    (distinct, original first — order is not part of the contract)."""
    dels = F.transform(
        F.sequence(F.lit(1), F.length(c)),
        lambda i: F.concat(
            c.substr(F.lit(1), i - 1),
            c.substr(i + 1, F.length(c)),
        ),
    )
    return F.array_distinct(F.concat(F.array(c), dels))


def fuzzy_match_del1(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    broadcast_right: bool = True,
) -> DataFrame:
    """(left_val, right_val, dist): every pair within Levenshtein
    distance 1, via shared 1-deletion-neighborhood keys + exact verify.
    ``broadcast_right=True`` for dictionary-sized right sides (the
    vendor-list case); set False when both sides are corpus-scale."""
    lv = left.select(F.col(left_col).alias("left_val")).distinct().select(
        "left_val", F.explode(deletion_variants(F.col("left_val"))).alias("k")
    )
    rv = right.select(F.col(right_col).alias("right_val")).distinct().select(
        "right_val", F.explode(deletion_variants(F.col("right_val"))).alias("k")
    )
    if broadcast_right:
        rv = F.broadcast(rv)
    cand = lv.join(rv, "k").select("left_val", "right_val").distinct()
    return cand.select(
        "left_val",
        "right_val",
        F.levenshtein("left_val", "right_val").alias("dist"),
    ).filter(F.col("dist") <= 1)


def fuzzy_match_del1_sql(left_cte: str, right_cte: str) -> str:
    """DuckDB mirror over relations with columns (left_val) / (right_val)."""
    variants = (
        "list_distinct(list_prepend({0}, "
        "list_transform(range(1, length({0}) + 1), "
        "i -> substring({0}, 1, i - 1) || substring({0}, i + 1, length({0})))))"
    )
    return f"""
SELECT left_val, right_val,
       CAST(levenshtein(left_val, right_val) AS INTEGER) AS dist
FROM (
  SELECT DISTINCT left_val, right_val FROM (
    SELECT l.left_val, r.right_val
    FROM (SELECT left_val, unnest({variants.format('left_val')}) AS k
          FROM (SELECT DISTINCT left_val FROM {left_cte})) l
    JOIN (SELECT right_val, unnest({variants.format('right_val')}) AS k
          FROM (SELECT DISTINCT right_val FROM {right_cte})) r
    ON l.k = r.k))
WHERE levenshtein(left_val, right_val) <= 1
""".strip()
