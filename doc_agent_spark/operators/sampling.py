"""Deterministic sampling for training-data curation.

Spark's ``df.sample`` is seed-dependent on partitioning (a repartition or
cluster-size change reshuffles which rows a seed selects) — useless when a
sample must be reproducible across runs and cluster sizes, or mirrored by
an external oracle. These samplers decide per ROW from a content hash, so
the same row is always in or out regardless of physical layout:

    keep(row)  ⇔  substr(md5(seed:key), 1, 8) < hex(fraction · 16^8)

The comparison is LEXICOGRAPHIC over lowercase hex, which orders exactly
like the underlying 32-bit number — no numeric conversion, so Spark and
the DuckDB oracle agree byte-for-byte. Everything is a zero-shuffle filter
projection; at 100 TB the sample is a pushdown-friendly scan filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ALWAYS = "g"          # every 8-char hex string sorts below 'g'
_NEVER = "00000000"    # no 8-char hex string sorts strictly below this


def hex_threshold(fraction: float) -> str:
    """8-hex-char cutoff such that P[md5-prefix < cutoff] = fraction."""
    if fraction >= 1.0:
        return _ALWAYS
    if fraction <= 0.0:
        return _NEVER
    return format(int(fraction * 16 ** 8), "08x")


def _hash8(key: Column, seed: str) -> Column:
    return F.substring(
        F.md5(F.concat(F.lit(f"{seed}:"), key.cast("string"))), 1, 8
    )


def sample_bernoulli(
    df: DataFrame, fraction: float, key_col: str, seed: str = "s42"
) -> DataFrame:
    """Uniform deterministic sample: a row is kept iff its hash prefix
    falls below the fraction cutoff. Stable under repartitioning, cluster
    size, and re-runs."""
    return df.filter(_hash8(F.col(key_col), seed) < F.lit(hex_threshold(fraction)))


def sample_stratified(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str,
    key_col: str,
    seed: str = "s42",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the training-data mixer: e.g.
    keep 100% of high-quality docs and 10% of boilerplate-heavy ones. The
    per-stratum cutoff map folds into a CASE expression (model-sized,
    never shuffled); unlisted strata get ``default_fraction``."""
    thr = F.lit(hex_threshold(default_fraction))
    for value, frac in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == value, F.lit(hex_threshold(frac))).otherwise(thr)
    return df.filter(_hash8(F.col(key_col), seed) < thr)


def hash8_sql(key_expr: str, seed: str = "s42") -> str:
    """DuckDB mirror of the hash prefix (md5 hex is engine-identical)."""
    return f"substr(md5('{seed}:' || CAST({key_expr} AS VARCHAR)), 1, 8)"
