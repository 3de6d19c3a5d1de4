"""Streaming face of the incremental ingestion dedup screen.

Each micro-batch of newly-arrived documents runs the full
exact+near-dup screen against the static catalog inside
``foreachBatch`` (multiple streaming aggregations in one query are
unsupported, and the screen needs three). Because
``incremental_dedup_screen`` makes each new doc's verdict a function
of (doc, catalog) only, the union of per-batch outputs is bit-equal
to the all-at-once batch answer — proven by the same DuckDB oracle as
``x_incremental_dedup`` and, batch-boundary-wise, by
tests/test_streaming_dedup.py, which replays the stream split across
three files.

At 100 TB the catalog's shingle sets and band table are the reusable
state (materialize them once, refresh on compaction); each arriving
batch pays only its own shingling plus one band join against that
state — linear in the batch, regardless of catalog size growth.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ast_data_pipeline_spark.lineage import lineage_cut_lazy

from ..operators.dedup import incremental_dedup_screen
from ..sources.catalog import table_path


def documents_stream(spark: SparkSession, path: str, glob: str = "documents.parquet") -> DataFrame:
    schema = spark.read.parquet(table_path(path, "documents") if glob == "documents.parquet" else path).schema
    return (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", glob)
        .load(path)
    )


def run_incremental_dedup_stream(
    spark: SparkSession,
    new_stream: DataFrame,
    cat_docs: DataFrame,
    num_hashes: int,
    rows_per_band: int,
    threshold: float,
) -> DataFrame:
    root = tempfile.mkdtemp(prefix="incdedup_stream_")
    out = os.path.join(root, "out")
    cat_docs = cat_docs.select("doc_id", "text").transform(lineage_cut_lazy)

    def screen(batch_df: DataFrame, batch_id: int) -> None:
        res = incremental_dedup_screen(
            batch_df.select("doc_id", "text"), cat_docs,
            num_hashes, rows_per_band, threshold,
        )
        res.write.mode("append").parquet(out)

    q = (
        new_stream.writeStream.foreachBatch(screen)
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(root, "_chk"))
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out)


def streaming_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = documents_stream(spark, sf_dir).filter(
        F.col("doc_id") % 10 == 0
    )
    from ..sources.catalog import load

    cat = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 != 0)
    from ..queries.dedup import JACCARD_T, NUM_HASHES, ROWS_PER_BAND

    return run_incremental_dedup_stream(
        spark, stream, cat, NUM_HASHES, ROWS_PER_BAND, JACCARD_T
    )


def run_exactly_once_dedup(
    spark: SparkSession, ev_stream: DataFrame
) -> DataFrame:
    """Exactly-once event delivery from an at-least-once feed:
    ``withWatermark + dropDuplicatesWithinWatermark(event_id)`` holds
    per-key state only until the watermark passes the event's time —
    the BOUNDED-state production form of streaming dedup (a bare
    dropDuplicates keeps every key forever). Deduped rows append to a
    parquet sink per micro-batch; the census is computed at read."""
    out_dir = tempfile.mkdtemp(prefix="snap_eodedup_")
    sink = os.path.join(out_dir, "rows")

    deduped = ev_stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    q = (
        deduped.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", os.path.join(out_dir, "_chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(sink)
    return got.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_id").alias("n_distinct"),
    )


def streaming_exactly_once_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feed: every event, with every 3rd event DUPLICATED (the
    at-least-once redelivery model), written to a temp stream dir."""
    from ..sources.catalog import load

    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    feed = ev.withColumn(
        "copies",
        F.explode(
            F.when(
                F.col("event_id") % 3 == 0, F.array(F.lit(1), F.lit(2))
            ).otherwise(F.array(F.lit(1)))
        ),
    ).drop("copies")
    src = os.path.join(
        tempfile.gettempdir(), "ast_eo_dedup", os.path.basename(sf_dir.rstrip("/"))
    )
    feed.write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(feed.schema).format("parquet").load(src)
    )
    return run_exactly_once_dedup(spark, stream)
