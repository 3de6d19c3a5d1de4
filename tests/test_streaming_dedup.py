"""Batch-boundary independence of the streaming incremental dedup:
replaying the new-doc stream split across three files (one micro-batch
each) must union to exactly the all-at-once batch screen."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def test_multi_batch_equals_batch(spark, sf_dir, tmp_path):
    from ast_data_pipeline_spark.queries.dedup import (
        JACCARD_T,
        NUM_HASHES,
        ROWS_PER_BAND,
    )
    from ast_data_pipeline_spark.sources.catalog import load
    from ast_data_pipeline_spark.streaming.dedup_stream import (
        run_incremental_dedup_stream,
    )
    from ast_data_pipeline_spark.operators.dedup import incremental_dedup_screen

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    new, cat = docs.filter(F.col("doc_id") % 10 == 0), docs.filter(
        F.col("doc_id") % 10 != 0
    )
    # three single-file slices -> three micro-batches
    src = str(tmp_path / "new_docs")
    for i in range(3):
        new.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    n_files = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    assert n_files >= 3
    stream = (
        spark.readStream.schema(new.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    streamed = run_incremental_dedup_stream(
        spark, stream, cat, NUM_HASHES, ROWS_PER_BAND, JACCARD_T
    ).toPandas()
    batch = incremental_dedup_screen(
        new, cat, NUM_HASHES, ROWS_PER_BAND, JACCARD_T
    ).toPandas()
    key = ["doc_id"]
    a = streamed.sort_values(key).reset_index(drop=True)[batch.columns]
    b = batch.sort_values(key).reset_index(drop=True)
    assert a.equals(b), (len(a), len(b))


def test_streaming_hll_batch_boundary_independence(spark, sf_dir, tmp_path):
    """Register max-merge across micro-batches must land on the exact
    registers (and therefore the exact estimate) of the all-at-once
    batch sketch — replay the documents stream as 3 single-file
    micro-batches and compare bit-for-bit."""
    from ast_data_pipeline_spark.queries.aggregates import (
        hll_estimate,
        hll_registers,
        hll_tokens,
    )
    from ast_data_pipeline_spark.sources.catalog import load
    from ast_data_pipeline_spark.streaming.sketches_stream import (
        run_hll_maintenance,
    )

    docs = load(spark, sf_dir, "documents").select("source", "text")
    src = str(tmp_path / "docs_stream")
    for i in range(3):
        docs.filter(F.crc32(F.col("text")) % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    n_files = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    assert n_files >= 3
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    streamed = run_hll_maintenance(spark, stream).toPandas()
    batch = hll_estimate(hll_registers(hll_tokens(docs))).toPandas()
    a = streamed.sort_values("source").reset_index(drop=True)[batch.columns]
    b = batch.sort_values("source").reset_index(drop=True)
    assert a.equals(b), (len(a), len(b))


def test_streaming_tagging_batch_boundary_independence(spark, sf_dir, tmp_path):
    """Count-addition merge across micro-batches must land on exactly
    the batch keyword census — replay documents as 3 single-file
    micro-batches (the one-file production fixture only exercises the
    single-batch path) and compare bit-for-bit."""
    from ast_data_pipeline_spark.queries.text import ac_tag_aggregate, ac_tagged
    from ast_data_pipeline_spark.sources.catalog import load
    from ast_data_pipeline_spark.streaming.tagging_stream import (
        run_tagging_maintenance,
    )

    docs = load(spark, sf_dir, "documents").select(
        "source", F.lower("text").alias("t")
    )
    src = str(tmp_path / "tag_docs")
    for i in range(3):
        docs.filter(F.crc32(F.col("t")) % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    n_files = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    assert n_files >= 3
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    streamed = run_tagging_maintenance(spark, stream).toPandas()
    batch = ac_tag_aggregate(ac_tagged(docs)).toPandas()
    key = ["source", "keyword"]
    a = streamed.sort_values(key).reset_index(drop=True)[batch.columns]
    b = batch.sort_values(key).reset_index(drop=True).astype(a.dtypes.to_dict())
    assert a.equals(b), (len(a), len(b))


def test_custom_state_batch_boundary_independence(spark, sf_dir, tmp_path):
    """applyInPandasWithState profile: engine-managed state updated
    across 3 micro-batches, Update-mode rows reduced by element-wise
    max (all metrics monotone) must equal the batch profile."""
    from ast_data_pipeline_spark.sources.catalog import load
    from ast_data_pipeline_spark.streaming.custom_state import run_custom_state

    ev = load(spark, sf_dir, "events")
    src = str(tmp_path / "apws_events")
    for i in range(3):
        ev.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    streamed = run_custom_state(spark, stream, "apws_test_sink").toPandas()
    batch = (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long")
            .alias("n_purchases"),
            F.max("value").alias("max_value"),
        )
        .toPandas()
    )
    a = streamed.sort_values("user_id").reset_index(drop=True)[batch.columns]
    b = batch.sort_values("user_id").reset_index(drop=True).astype(a.dtypes.to_dict())
    assert a.equals(b), (len(a), len(b))
