"""Streaming-vs-batch semantics checks beyond the oracle gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from ast_data_pipeline_spark.registry import load_all


def test_stream_sessionize_contained_in_batch(spark, sf_dir):
    specs = load_all()
    stream = specs["s_stream_sessionize"].fn(spark, sf_dir).toPandas()
    batch = specs["e_sessionize"].fn(spark, sf_dir).toPandas()
    assert len(stream) > 0
    # every finalized streaming session matches a batch session exactly
    # (user, start, n_events); gap semantics differ only at the exact
    # 1800s boundary (session_window: strict overlap; lag-gap: > 1800)
    bkeys = {
        (r.user_id, r.session_start, r.n_events) for r in batch.itertuples()
    }
    skeys = {
        (r.user_id, r.session_start, r.n_events) for r in stream.itertuples()
    }
    missing = skeys - bkeys
    assert len(missing) <= max(1, len(skeys) // 100), list(missing)[:5]
    # the withheld tail is small: >=90% of batch sessions were finalized
    assert len(skeys) >= 0.9 * len(bkeys)


def test_upsert_snapshot_multi_batch_merge(spark, sf_dir, tmp_path):
    # The registered query's availableNow run may see one micro-batch
    # (single source file); this pins the MERGE path: 3 files streamed
    # one per trigger => 3 foreachBatch merges, result must still equal
    # the batch latest-per-key — including a cross-batch tie where the
    # winning event arrives in an EARLIER batch than the loser.
    import pyspark.sql.functions as F

    from ast_data_pipeline_spark.streaming.upsert import run_upsert

    rows = [
        # (event_id, user_id, ts, event_type, value)
        (1, 1, "2024-01-01 10:00:00", "click", 1.0),
        (2, 2, "2024-01-01 10:00:00", "view", 2.0),
        (7, 1, "2024-01-03 09:00:00", "purchase", 9.0),   # u1 winner (file 1!)
        (3, 1, "2024-01-02 10:00:00", "view", 3.0),
        (4, 2, "2024-01-04 10:00:00", "click", 4.0),      # u2 ts winner...
        (5, 2, "2024-01-04 10:00:00", "view", 5.0),       # ...but id 5 > 4 wins tie
        (6, 3, "2024-01-01 00:00:00", "view", 6.0),
    ]
    src = tmp_path / "ev"
    src.mkdir()
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    for i, chunk in enumerate([rows[:3], rows[3:6], rows[6:]]):
        cdf = spark.createDataFrame(
            chunk, "event_id long, user_id long, ts string, event_type string, value double"
        ).withColumn("ts", F.to_timestamp("ts"))
        cdf.coalesce(1).write.parquet(str(src / f"part{i}"))
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/part*")
    )
    got = {
        r.user_id: (r.last_ts, r.last_type, r.last_value)
        for r in run_upsert(spark, stream).collect()
    }
    assert got == {
        1: ("2024-01-03 09:00:00", "purchase", 9.0),
        2: ("2024-01-04 10:00:00", "view", 5.0),
        3: ("2024-01-01 00:00:00", "view", 6.0),
    }


def test_sessionize_gap_boundary_exact(spark, tmp_path):
    # r5 late find / VERDICT r5 #3: Spark's session_window merges
    # sessions that TOUCH at the gap boundary — an event arriving
    # exactly `gap` after its predecessor JOINS the session; only
    # strictly-greater gaps start a new one. The batch gaps-and-islands
    # query uses the same `> gap` rule, so both faces must merge the
    # exact-1800s pair and split the 1801s pair. Fixture-driven: the
    # synthetic corpus has no boundary-exact pair below sf0.1.
    import pyarrow as pa
    import pyarrow.parquet as pq

    sfd = tmp_path / "sf_boundary"
    sfd.mkdir()
    ts = pa.array(
        [
            "2024-01-01 10:00:00",  # u1 session head
            "2024-01-01 10:30:00",  # u1: exactly gap later -> MERGES
            "2024-01-01 10:00:00",  # u2 session head
            "2024-01-01 10:30:01",  # u2: gap+1s -> SPLITS
            "2024-01-01 20:00:00",  # u3: pushes terminal watermark
        ]
    ).cast(pa.timestamp("us"))
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "ts": ts,
            "user_id": pa.array([1, 1, 2, 2, 3], pa.int64()),
            "event_type": pa.array(["click"] * 5),
            "value": pa.array([1.0] * 5),
            "props": pa.array([""] * 5),
        }
    )
    pq.write_table(tbl, sfd / "events.parquet")

    specs = load_all()
    batch = {
        (r.user_id, r.session_start): r
        for r in specs["e_sessionize"].fn(spark, str(sfd)).toPandas().itertuples()
    }
    # u1: ONE session spanning both events; u2: TWO one-event sessions
    assert batch[(1, "2024-01-01 10:00:00")].n_events == 2
    assert batch[(1, "2024-01-01 10:00:00")].session_end == "2024-01-01 10:30:00"
    assert batch[(2, "2024-01-01 10:00:00")].n_events == 1
    assert batch[(2, "2024-01-01 10:30:01")].n_events == 1
    assert len([k for k in batch if k[0] == 2]) == 2

    stream = {
        (r.user_id, r.session_start): r
        for r in specs["s_stream_sessionize"].fn(spark, str(sfd)).toPandas().itertuples()
    }
    # u3's open session is withheld by the watermark; u1/u2 finalized
    assert stream[(1, "2024-01-01 10:00:00")].n_events == 2
    # session_window end = last_ts + gap
    assert stream[(1, "2024-01-01 10:00:00")].session_end == "2024-01-01 11:00:00"
    assert stream[(2, "2024-01-01 10:00:00")].n_events == 1
    assert stream[(2, "2024-01-01 10:30:01")].n_events == 1
    assert not any(k[0] == 3 for k in stream)


def test_agg_maintenance_batch_boundary_independent(spark, tmp_path):
    # The maintained (count, decimal-sum) state must land on identical
    # bits no matter how the stream is micro-batched: replay the same
    # rows as 1 batch and as 3 batches (maxFilesPerTrigger=1) and
    # compare against the plain batch aggregate. Values chosen so
    # float addition order WOULD matter (1e15 + 1 + -1e15 style) —
    # the decimal state is what keeps the paths equal.
    from ast_data_pipeline_spark.streaming.upsert import run_agg_maintenance

    rows = [
        (1, 1e15), (1, 1.0), (1, -1e15), (1, 2.5),
        (2, 0.1), (2, 0.2), (2, 0.3),
        (3, 7.0),
    ]
    schema = "user_id long, value double"
    src = tmp_path / "ev3"
    src.mkdir()
    chunks = [rows[:3], rows[3:6], rows[6:]]
    for i, chunk in enumerate(chunks):
        spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(
            str(src / f"part{i}")
        )
    batch = {
        (r.user_id): (r.n_events, r.total_value)
        for r in spark.read.parquet(str(src) + "/part*")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(30,10)")), 4)
            .cast("double")
            .alias("total_value"),
        )
        .collect()
    }
    stream3 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/part*")
    )
    got3 = {
        r.user_id: (r.n_events, r.total_value)
        for r in run_agg_maintenance(spark, stream3).collect()
    }
    stream1 = spark.readStream.schema(schema).parquet(str(src) + "/part*")
    got1 = {
        r.user_id: (r.n_events, r.total_value)
        for r in run_agg_maintenance(spark, stream1).collect()
    }
    assert got3 == batch == got1
    assert batch[1] == (4, 3.5)  # the float-order trap case


def test_state_partition_bound(spark, sf_dir, monkeypatch):
    """SPARK_GRAFT_STREAM_PARTS is load-bearing (VERDICT r9 #4: one
    state-store task per shuffle partition PER micro-batch made the
    stream-stream left join 19 s at 32 partitions, 2.7 s at 8). Pin
    that a stateful run actually executes with the bounded partition
    count — observed from the query's own StateOperatorProgress, not
    the conf — and that the session conf is restored afterwards."""
    from ast_data_pipeline_spark.streaming import workqueue

    monkeypatch.setenv("SPARK_GRAFT_STREAM_PARTS", "5")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    out = load_all()["s_stream_stream_left_join"].fn(spark, sf_dir)
    assert out.count() > 0
    assert workqueue.LAST_RUN_STATE_PARTS == 5, (
        "stateful query ran with %s state partitions, not the bound"
        % workqueue.LAST_RUN_STATE_PARTS
    )
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev
