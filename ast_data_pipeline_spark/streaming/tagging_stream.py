"""Streaming maintenance of the keyword-tagging census.

Each micro-batch of arriving documents is tagged by the broadcast
Aho-Corasick automaton (one pass for all keywords, the batch query's
own stage) and its per-(source, keyword) partial counts are ADDED to
the standing state inside ``foreachBatch`` — counts are associative,
so the maintained census is identical to a batch pass over all
documents no matter how the stream was micro-batched. The oracle is
x_keyword_tagging_ac's oracle verbatim.

At 100 TB this is the content-dashboard pattern: standing state is
one row per (source, keyword) — bounded by the tag vocabulary, not
the corpus — and each batch pays one automaton pass over its own
documents plus a merge against that tiny state.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.text import ac_tag_aggregate, ac_tagged
from .dedup_stream import documents_stream


def run_tagging_maintenance(spark: SparkSession, docs_stream: DataFrame) -> DataFrame:
    snap_root = tempfile.mkdtemp(prefix="snap_tag_")
    state: dict[str, str | None] = {"path": None}

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        part = ac_tag_aggregate(ac_tagged(batch_df))
        if state["path"] is not None:
            prev = batch_df.sparkSession.read.parquet(state["path"])
            part = (
                prev.unionByName(part)
                .groupBy("source", "keyword")
                .agg(
                    F.sum("n_docs").alias("n_docs"),
                    F.sum("n_matches").alias("n_matches"),
                )
            )
        new_path = os.path.join(snap_root, f"v{batch_id}")
        part.write.mode("overwrite").parquet(new_path)
        state["path"] = new_path

    q = (
        docs_stream.writeStream.foreachBatch(merge)
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(snap_root, "_chk"))
        .start()
    )
    q.awaitTermination()
    assert state["path"] is not None, "stream produced no batches"
    out = spark.read.parquet(state["path"])
    return out.select(
        "source",
        "keyword",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_matches").cast("long").alias("n_matches"),
    )


def streaming_keyword_tagging(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = documents_stream(spark, sf_dir).select(
        "source", F.lower("text").alias("t")
    )
    return run_tagging_maintenance(spark, stream)
