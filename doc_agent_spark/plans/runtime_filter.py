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


def bloom_flag(big: DataFrame, words: DataFrame, key_col: str,
               flag_col: str = "_rtf_maybe",
               m_bits: int = 16384, n_hashes: int = 3,
               seed: str = "bloom") -> DataFrame:
    """Append a boolean ``flag_col``: true iff ``key_col`` MAY be in the
    filter (non-null and all n_hashes probe bits set). Row-preserving
    (each probe left-joins the unique-keyed word table); zero exchanges —
    n_hashes BroadcastHashJoins. The semi/anti reductions below split on
    this flag; callers with custom routing (e.g. quarantine-the-maybes)
    can use it directly."""
    flagged = big
    conds = [F.col(key_col).isNotNull()]
    for j in range(n_hashes):
        wj = F.broadcast(
            words.select(F.col("word").alias(f"_rtf_w{j}"),
                         F.col("mask").alias(f"_rtf_m{j}"))
        )
        bit = sketches.bloom_bit(F.col(key_col), j, m_bits, seed)
        flagged = (
            flagged.withColumn(f"_rtf_b{j}", bit)
            .withColumn(f"_rtf_w{j}", F.expr(f"cast(_rtf_b{j} div 32 as int)"))
            .join(wj, f"_rtf_w{j}", "left")
        )
        conds.append(
            F.col(f"_rtf_m{j}").isNotNull()
            & (
                F.col(f"_rtf_m{j}").bitwiseAND(
                    F.expr(f"shiftleft(cast(1 as bigint), cast(_rtf_b{j} % 32 as int))")
                )
                != 0
            )
        )
    out = flagged
    acc = conds[0]
    for c in conds[1:]:
        acc = acc & c
    out = out.withColumn(flag_col, acc)
    for j in range(n_hashes):
        out = out.drop(f"_rtf_b{j}", f"_rtf_w{j}", f"_rtf_m{j}")
    return out


def bloom_prune(big: DataFrame, words: DataFrame, key_col: str,
                m_bits: int = 16384, n_hashes: int = 3,
                seed: str = "bloom") -> DataFrame:
    """Scan-side Bloom prune: keep only rows of ``big`` whose ``key_col``
    MAY be in the filter (all probe bits set). Row-preserving for
    survivors, schema unchanged; null keys are dropped (they cannot match
    an equi-join anyway). Zero exchanges."""
    return (
        bloom_flag(big, words, key_col, m_bits=m_bits,
                   n_hashes=n_hashes, seed=seed)
        .filter(F.col("_rtf_maybe"))
        .drop("_rtf_maybe")
    )


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


def bloom_anti_join(big: DataFrame, keys: DataFrame, key_col: str,
                    m_bits: int = 1 << 22, n_hashes: int = 3,
                    seed: str = "bloom") -> DataFrame:
    """``big LEFT ANTI JOIN keys`` with the exact anti join paid only by
    the Bloom-MAYBE slice — the drop-list application shape.

    Applying a near-dup/contamination drop list to a 10^12-row corpus is
    an anti join where the right side can be 30–50 % of the corpus —
    far past broadcast size, so the naive plan shuffles ALL corpus rows.
    Bloom misses are DEFINITE non-members (no false negatives): those
    rows — the kept majority in the sparse-droplist regime, and every
    null-key row — bypass the join entirely with zero shuffle; only the
    maybe slice (true drops + the FP fraction) runs the exact left-anti
    join that clears the false positives back into the output. Column
    order and row multiplicity match the plain anti join exactly.

    The m_bits default is sized for drop-list use (2^22 bits = 512 KiB
    broadcast, ~1 % FP at 10^6 dropped keys); size m_bits ≈ 10·|keys|
    for ~2 % FP, or merge per-partition filters from bloom_build for
    incremental lists."""
    words = sketches.bloom_build(
        keys.select(key_col), key_col, m_bits=m_bits, n_hashes=n_hashes, seed=seed
    )
    flagged = bloom_flag(big, words, key_col, m_bits=m_bits,
                         n_hashes=n_hashes, seed=seed)
    definite_keep = flagged.filter(~F.col("_rtf_maybe")).drop("_rtf_maybe")
    maybe = flagged.filter(F.col("_rtf_maybe")).drop("_rtf_maybe")
    cleared = maybe.join(keys.select(key_col), key_col, "left_anti")
    # left_anti preserves the left schema; realign for the union
    return definite_keep.unionByName(cleared.select(*definite_keep.columns))
