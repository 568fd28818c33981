"""Incremental view maintenance (IVM) for join views: compute the DELTA
of a materialized inner equi-join when both inputs receive append-only
batches, without ever re-joining the full snapshots.

    delta(A ⋈ B) = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB
    view_new     = view_old ∪ delta            (append-only inputs)

— the classic delta-rule algebra (Blakeley et al. 1986; the linear bilinear
form DBSP/Materialize generalize). The operational point at 10^12 rows:
``A_old ⋈ B_old`` — the term that costs a full double scan — is exactly the
term the rule never computes; every term joins a DELTA against a snapshot,
so maintenance cost scales with the batch, not the view. Pair each term
with the scan-side reductions this repo already ships: broadcast the delta
when it fits, else Bloom-prune the snapshot side against the delta's keys
(plans/runtime_filter.bloom_semi_join) before the equi-join.

Scope: append-only deltas (the crawl/landing-zone shape). Deletions
retract by the same algebra with the drop list as the delta and the terms
applied as anti-joins (jobs/forget.py is that shape applied to index
artifacts); an update is delete+insert. Aggregates over the view fold the
delta with operators/incremental_agg.py's mergeable state — the two
modules compose into full view maintenance (join delta → state merge).

Deterministic and engine-portable: pure relational algebra, so the DuckDB
oracle replays the identical three-term union (:func:`join_delta_sql`);
the ``ivm_src`` provenance tag makes each term independently checkable.

Reference anchor: the reference's upsert-on-conflict (packages/storage/
src/index.ts:29-54) keeps the DOCUMENTS table incremental; this keeps a
derived JOIN view incremental — the missing half of its snapshot story.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_delta(
    a_old: DataFrame,
    da: DataFrame,
    b_old: DataFrame,
    db: DataFrame,
    on,
) -> DataFrame:
    """Delta rows of the inner equi-join view, tagged with provenance
    (``ivm_src`` ∈ {'dA*B', 'A*dB', 'dA*dB'}). ``view_old ∪ result`` is
    row-identical to re-joining the updated tables (pinned in
    tests/test_ivm.py)."""
    d1 = da.join(b_old, on).withColumn("ivm_src", F.lit("dA*B"))
    d2 = a_old.join(db, on).withColumn("ivm_src", F.lit("A*dB"))
    d3 = da.join(db, on).withColumn("ivm_src", F.lit("dA*dB"))
    return d1.unionByName(d2).unionByName(d3)


def join_delta_sql(
    a_old_sql: str, da_sql: str, b_old_sql: str, db_sql: str,
    on: str, select: str = "*",
) -> str:
    """DuckDB mirror of :func:`join_delta` (inputs are SELECTs; ``on`` is
    the join key column present on both sides; ``select`` projects the
    joined row — must not include ivm_src)."""
    def term(left: str, right: str, tag: str) -> str:
        return f"""
SELECT {select}, '{tag}' AS ivm_src
FROM ({left}) ivl JOIN ({right}) ivr USING ({on})"""

    return (
        term(da_sql, b_old_sql, "dA*B")
        + " UNION ALL " + term(a_old_sql, db_sql, "A*dB")
        + " UNION ALL " + term(da_sql, db_sql, "dA*dB")
    )
