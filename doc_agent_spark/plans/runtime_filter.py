"""Semi-join reduction via a broadcast Bloom filter — the runtime-filter /
sideways-information-passing pattern.

Spark's own ``InjectRuntimeFilter`` rule does this opportunistically for
shuffle joins when creation-side statistics allow; this is the explicit,
engine-portable form built on the repo's deterministic packed Bloom
(``operators/sketches.bloom_build``), so the DuckDB oracle reproduces every
probe bit and the gate can prove row-identity with the plain semi join.

100 TB shape: a 10^12-row fact side semi-joined against a selective key set
normally shuffles the FULL fact side on the join key before a single row is
dropped. Here the key set is compressed to a packed Bloom word table
(m_bits/32 rows ≈ 12 B each — broadcastable at any corpus size) and the
fact side is pruned SCAN-SIDE: each row tests its n_hashes probe bits via
n_hashes broadcast hash joins against the word table (narrow — no shuffle,
no row explosion, rows drop after each probe so later probes see fewer
rows). Only survivors — true matches plus the classic deterministic
false-positive fraction — pay the exact semi-join shuffle. Bloom filters
have no false negatives, so prune ∘ exact-semi ≡ plain left-semi,
row-for-row; the ``semi_anti_join`` gate arm checks exactly that equality
against a plain ``IN``-subquery oracle.

Reference parity: the reference has no distributed join machinery at all
(single-process SQLite lookups, packages/core/src/services/database.ts);
this is part of the scale-out surface the Spark engine adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from doc_agent_spark.operators import sketches


def bloom_prune(big: DataFrame, words: DataFrame, key_col: str,
                m_bits: int = 16384, n_hashes: int = 3,
                seed: str = "bloom") -> DataFrame:
    """Scan-side Bloom prune: keep only rows of ``big`` whose ``key_col``
    MAY be in the filter (all probe bits set). Row-preserving for
    survivors (each probe joins the unique-keyed word table), schema
    unchanged; null keys are dropped (they cannot match an equi-join
    anyway). Zero exchanges: n_hashes BroadcastHashJoins + filters."""
    pruned = big.filter(F.col(key_col).isNotNull())
    for j in range(n_hashes):
        wj = F.broadcast(
            words.select(F.col("word").alias("_rtf_w"), F.col("mask").alias("_rtf_m"))
        )
        bit = sketches.bloom_bit(F.col(key_col), j, m_bits, seed)
        pruned = (
            pruned.withColumn("_rtf_b", bit)
            .withColumn("_rtf_w", F.expr("cast(_rtf_b div 32 as int)"))
            .join(wj, "_rtf_w", "left")
            .filter(
                F.col("_rtf_m").isNotNull()
                & (
                    F.col("_rtf_m").bitwiseAND(
                        F.expr("shiftleft(cast(1 as bigint), cast(_rtf_b % 32 as int))")
                    )
                    != 0
                )
            )
            .drop("_rtf_b", "_rtf_w", "_rtf_m")
        )
    return pruned


def bloom_semi_join(big: DataFrame, keys: DataFrame, key_col: str,
                    m_bits: int = 16384, n_hashes: int = 3,
                    seed: str = "bloom") -> DataFrame:
    """``big LEFT SEMI JOIN keys ON big[key_col] = keys[key_col]`` with the
    fact side Bloom-pruned before the exact join.

    ``keys`` needs only the ``key_col`` column (extra columns are ignored);
    the filter is built from its distinct values, the pruned fact side
    then runs the exact left-semi join so false positives never surface.
    Result is row-identical to the plain semi join (gate-proved)."""
    words = sketches.bloom_build(
        keys.select(key_col), key_col, m_bits=m_bits, n_hashes=n_hashes, seed=seed
    )
    pruned = bloom_prune(big, words, key_col, m_bits=m_bits,
                         n_hashes=n_hashes, seed=seed)
    return pruned.join(keys.select(key_col), key_col, "left_semi")
