"""Checkpoint-resumable incremental rollup maintenance job — keep a
persisted aggregation snapshot current against arriving batches without
ever re-scanning history (operators/incremental_agg.py lifted to a
deployable stage, the batch analog of a Structured Streaming aggregation's
state store).

    spark-submit --py-files dist.zip jobs/rollup.py \\
        --input /landing/events_2026_08_20.parquet \\
        --state /warehouse/rollups/events_hourly \\
        --keys event_type,hour_of_day --value value \\
        --batch-id 2026-08-20 [--serve /warehouse/serving/events_hourly]

Snapshot model: the state directory holds versioned snapshots
(``snapshot_v{N}`` parquet — per-key mergeable partial state: count /
fixed-point long sum / min / max) plus an append-only ``applied`` ledger
(batch_id, version, n_state_rows, applied_at). Applying a batch is

    state(batch)  →  merge(snapshot_vN, batch state)  →  snapshot_v{N+1}

one hash aggregation over batch + key-cardinality-sized state; history is
never touched. The long-typed fixed-point sums make the result bit-exact
under any batch order or cluster size, so snapshot_v{N} is a pure function
of the applied batch SET.

Resume / idempotency (the jobs/extract.py ledger protocol):

- a batch_id already in the ledger is skipped outright — re-running a
  completed day is a no-op, like the reference's upsert-by-path
  (packages/storage/src/index.ts:29-54) generalized to aggregates;
- a crash AFTER the snapshot write but BEFORE the ledger append leaves an
  orphan ``snapshot_v{N+1}`` dir; the re-run still sees version N in the
  ledger, recomputes the identical merge, and overwrites it — the ledger
  append is the commit point;
- keys/value/scale are a config identity (they define the state schema and
  the fixed-point encoding): recorded beside the state on first write,
  enforced on every later one;
- single-writer per state directory (the extract/curate/pack jobs' same
  contract): two batches applying concurrently would both read version N
  and race on snapshot_v{N+1} — schedule batches serially per rollup.

``--serve`` additionally materializes the finalized serving projection
(n_events / sum / avg / min / max) — a zero-shuffle map over the snapshot.

At 10^12 rows: the batch agg is the only data-sized stage (map-side
partial combine, one exchange on the keys); the merge joins two
key-cardinality-sized tables; a key explosion (e.g. a high-cardinality
accident in the key list) shows up as state growth in the ledger's
n_state_rows column — the operational early-warning this job exists for.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

LEDGER_SCHEMA = (
    "batch_id string, version long, n_state_rows long, batch_rows long,"
    " wall_ms long"
)


def _ledger(spark: SparkSession, state_path: str):
    """None means NO ledger exists; an unreadable ledger RAISES. Conflating
    the two (a bare except) would silently reset version to 0, overwrite
    snapshot_v1 with batch-only state, and mark the batch applied — silent
    data loss. A torn ledger (crash mid-append) is a stop-the-line event
    that needs an operator, not a quiet restart."""
    path = os.path.join(state_path, "applied")
    if not os.path.exists(path):
        return None
    try:
        return spark.read.schema(LEDGER_SCHEMA + ", applied_at timestamp").parquet(path)
    except Exception as e:
        raise RuntimeError(
            f"rollup ledger at {path} exists but is unreadable — refusing to "
            f"treat it as version 0 (would orphan all applied batches): {e}"
        ) from e


def current_version(spark: SparkSession, state_path: str) -> int:
    led = _ledger(spark, state_path)
    if led is None:
        return 0
    row = led.agg(F.max("version").alias("v")).collect()[0]
    return int(row["v"] or 0)


def run_rollup(
    spark: SparkSession,
    input_path: str,
    state_path: str,
    keys: list[str],
    value_col: str,
    batch_id: str,
    scale: int = 6,
    serve_path: str | None = None,
    retain_last: int = 2,
) -> dict:
    from doc_agent_spark.operators import incremental_agg as ia
    from doc_agent_spark.operators.publish import check_or_write_config

    t0 = time.time()
    os.makedirs(state_path, exist_ok=True)
    cfg_base = os.path.join(state_path, "rollup")
    cfg = {"keys": keys, "value": value_col, "scale": scale}
    # fail fast on drift against an EXISTING config, but don't record a new
    # one until the first successful commit — a typo'd first run must not
    # poison the state dir with a config that then rejects the corrected run
    if os.path.exists(cfg_base + "_config.json"):
        check_or_write_config(cfg_base, cfg)

    led = _ledger(spark, state_path)
    applied = set()
    version = 0
    if led is not None:
        agg = led.agg(
            F.max("version").alias("v"), F.collect_set("batch_id").alias("ids")
        ).collect()[0]
        version = int(agg["v"] or 0)
        applied = set(agg["ids"] or [])

    skipped = batch_id in applied
    if not skipped:
        batch = (
            spark.read.parquet(input_path) if "/" in input_path
            else spark.read.table(input_path)
        )
        # localCheckpoint: the batch scan runs ONCE to materialize the
        # key-cardinality-sized state; batch_rows then derives from it
        # (sum of per-key n) instead of a second data-sized count() pass
        state = ia.rollup_state(
            batch.select(*keys, value_col), keys, value_col, scale
        ).localCheckpoint()
        batch_rows = int(state.agg(F.sum("n")).collect()[0][0] or 0)
        if version > 0:
            prev = spark.read.parquet(
                os.path.join(state_path, f"snapshot_v{version}")
            )
            state = ia.merge_states(prev, state)
        new_version = version + 1
        snap_path = os.path.join(state_path, f"snapshot_v{new_version}")
        # overwrite: an orphan dir from a crash before the ledger commit is
        # rewritten with the identical deterministic content
        state.write.mode("overwrite").parquet(snap_path)
        n_state = spark.read.parquet(snap_path).count()
        wall_ms = int((time.time() - t0) * 1000)
        check_or_write_config(cfg_base, cfg)  # first commit records the config
        spark.createDataFrame(
            [(batch_id, new_version, n_state, batch_rows, wall_ms)], LEDGER_SCHEMA
        ).withColumn("applied_at", F.current_timestamp()).write.mode(
            "append"
        ).parquet(os.path.join(state_path, "applied"))
        version = new_version
    else:
        n_state = spark.read.parquet(
            os.path.join(state_path, f"snapshot_v{version}")
        ).count() if version > 0 else 0
        batch_rows = 0

    # snapshot retention (the expire_snapshots discipline of
    # operators/maintenance.plan_snapshot_expiry, applied to this job's own
    # state): only the LATEST snapshot is ever read — older versions exist
    # purely as a rollback window. Expire committed versions beyond
    # retain_last; the ledger (the audit trail) is never pruned.
    expired = []
    if retain_last >= 1:
        import shutil

        for v in range(1, version - retain_last + 1):
            p = os.path.join(state_path, f"snapshot_v{v}")
            if os.path.exists(p):
                shutil.rmtree(p)
                expired.append(v)

    if serve_path and version > 0:
        snap = spark.read.parquet(os.path.join(state_path, f"snapshot_v{version}"))
        ia.finalize(snap, scale=scale).write.mode("overwrite").parquet(serve_path)

    return {
        "batch_id": batch_id,
        "skipped": skipped,
        "version": version,
        "n_state_rows": int(n_state),
        "batch_rows": int(batch_rows),
        "expired_versions": expired,
        "wall_ms": int((time.time() - t0) * 1000),
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--state", required=True)
    ap.add_argument("--keys", required=True, help="comma-separated key columns")
    ap.add_argument("--value", required=True)
    ap.add_argument("--batch-id", required=True)
    ap.add_argument("--scale", type=int, default=6)
    ap.add_argument("--serve", default=None)
    ap.add_argument("--retain-last", type=int, default=2,
                    help="committed snapshot versions to keep (ledger never pruned)")
    args = ap.parse_args()

    from extract import ship_package  # same zip+addPyFile bootstrap

    spark = SparkSession.builder.appName(f"rollup-{args.batch_id}").getOrCreate()
    ship_package(spark)
    out = run_rollup(
        spark,
        input_path=args.input,
        state_path=args.state,
        keys=args.keys.split(","),
        value_col=args.value,
        batch_id=args.batch_id,
        scale=args.scale,
        serve_path=args.serve,
        retain_last=args.retain_last,
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
