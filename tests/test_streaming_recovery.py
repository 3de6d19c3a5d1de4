"""Streaming crash-recovery proof (VERDICT r11 #6).

The foreachBatch sinks claim exactly-once OUTPUT, not just
exactly-once values on a clean run: a micro-batch can execute its
side effects (snapshot written) and then die before Structured
Streaming commits the offset, and on restart that batch_id is
REPLAYED against the same sink. These tests inject exactly that crash
— after the batch's writes, before its commit — restart from the same
checkpoint, and assert the recovered final state is identical to an
uninterrupted run and to the batch recompute.

Two sinks, because they stress different properties:

- ``run_upsert`` (SCD1 argmax): the merge itself is idempotent, so
  the test pins the RESTART path — the prev-snapshot pointer must be
  rediscovered from disk (a driver-memory pointer silently forgets
  every pre-crash batch and passes a values-only test on clean runs).
- ``run_agg_maintenance`` (count/decimal-sum): the merge is NOT
  idempotent — replaying a batch against its own orphaned output
  double-counts — so the test pins the version-exclusion protocol
  (a replayed batch_id reads only versions < itself and overwrites
  its orphan).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.errors.exceptions.captured import StreamingQueryException

from ast_data_pipeline_spark.streaming.upsert import (
    run_agg_maintenance,
    run_upsert,
)

ROWS = [
    # (event_id, user_id, ts, event_type, value) — u1's winner arrives
    # in batch 0 so recovery must still see it after the batch-1 crash;
    # u2 ties on ts across batches (event_id breaks it); u4 exists ONLY
    # in batch 0 — the row a memory-pointer restart would lose.
    (1, 1, "2024-01-01 10:00:00", "click", 1.0),
    (7, 1, "2024-01-03 09:00:00", "purchase", 9.0),
    (8, 4, "2024-01-01 08:00:00", "view", 8.0),
    (3, 1, "2024-01-02 10:00:00", "view", 3.0),
    (4, 2, "2024-01-04 10:00:00", "click", 4.0),
    (5, 2, "2024-01-04 10:00:00", "view", 5.0),
    (6, 3, "2024-01-01 00:00:00", "view", 6.0),
    (9, 2, "2024-01-01 00:00:00", "view", 0.5),
]
SCHEMA = "event_id long, user_id long, ts string, event_type string, value double"
CHUNKS = [ROWS[:3], ROWS[3:6], ROWS[6:]]  # 3 files -> 3 micro-batches


def _write_source(spark, root):
    root.mkdir()
    for i, chunk in enumerate(CHUNKS):
        (
            spark.createDataFrame(chunk, SCHEMA)
            .withColumn("ts", F.to_timestamp("ts"))
            .coalesce(1)
            .write.parquet(str(root / f"part{i}"))
        )


def _stream(spark, root):
    schema = (
        spark.createDataFrame([], SCHEMA)
        .withColumn("ts", F.to_timestamp("ts"))
        .schema
    )
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(root) + "/part*")
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize(
    "runner", [run_upsert, run_agg_maintenance], ids=["upsert", "agg_maint"]
)
def test_crash_after_side_effects_then_resume(spark, tmp_path, runner):
    src = tmp_path / "ev"
    _write_source(spark, src)

    # uninterrupted run = the reference final state
    clean = _rows(runner(spark, _stream(spark, src), snap_root=str(tmp_path / "clean")))

    # run 1: crash AFTER batch 1's snapshot write, BEFORE its commit
    snap_root = str(tmp_path / "recov")
    with pytest.raises((StreamingQueryException, RuntimeError)):
        runner(
            spark,
            _stream(spark, src),
            snap_root=snap_root,
            crash_after_batch=1,
        )
    # the orphan v1 exists on disk (side effects ran) but is uncommitted
    import os

    assert os.path.isdir(os.path.join(snap_root, "v0"))
    assert os.path.isdir(os.path.join(snap_root, "v1"))

    # run 2: same snap_root -> same checkpoint -> batch 1 is REPLAYED,
    # then batch 2 runs; final state must equal the uninterrupted run
    recovered = _rows(runner(spark, _stream(spark, src), snap_root=snap_root))
    assert recovered == clean


def test_recovered_upsert_equals_batch_oracle(spark, tmp_path):
    src = tmp_path / "ev"
    _write_source(spark, src)
    snap_root = str(tmp_path / "recov")
    with pytest.raises((StreamingQueryException, RuntimeError)):
        run_upsert(
            spark, _stream(spark, src), snap_root=snap_root, crash_after_batch=0
        )
    got = {
        r.user_id: (r.last_ts, r.last_type, r.last_value)
        for r in run_upsert(spark, _stream(spark, src), snap_root=snap_root).collect()
    }
    assert got == {
        1: ("2024-01-03 09:00:00", "purchase", 9.0),
        2: ("2024-01-04 10:00:00", "view", 5.0),  # event_id 5 > 4 tie win
        3: ("2024-01-01 00:00:00", "view", 6.0),
        4: ("2024-01-01 08:00:00", "view", 8.0),  # batch-0-only user
    }


def test_recovered_agg_equals_batch_recompute(spark, tmp_path):
    src = tmp_path / "ev"
    _write_source(spark, src)
    snap_root = str(tmp_path / "recov")
    with pytest.raises((StreamingQueryException, RuntimeError)):
        run_agg_maintenance(
            spark, _stream(spark, src), snap_root=snap_root, crash_after_batch=1
        )
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in run_agg_maintenance(
            spark, _stream(spark, src), snap_root=snap_root
        ).collect()
    }
    # batch recompute from the raw rows — double-counted replays would
    # inflate n_events for users in batches 0-1
    expect: dict[int, list[float]] = {}
    for _eid, uid, _ts, _et, val in ROWS:
        expect.setdefault(uid, [0, 0.0])
        expect[uid][0] += 1
        expect[uid][1] += val
    assert got == {u: (n, round(s, 4)) for u, (n, s) in expect.items()}
