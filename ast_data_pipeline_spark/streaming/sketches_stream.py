"""Streaming maintenance of a HyperLogLog sketch.

Each micro-batch of arriving documents updates the per-(source,
bucket) register table by MAX-merge inside ``foreachBatch`` — the
defining mergeability of HLL: max over register values is associative
and commutative, so the maintained sketch is IDENTICAL to the one a
batch pass over all documents builds, no matter how the stream was
micro-batched. The estimate is finalized once at read time with the
same arithmetic as the batch query (``queries.aggregates.
hll_estimate``), so the streaming face shares a_hyperloglog_eval's
oracle columns verbatim.

At 100 TB this is the cardinality-dashboard pattern: the standing
state is K registers per group (kilobytes), each batch pays one
map-side register build plus a max-merge against state, and the
estimate never requires touching historical data.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.aggregates import hll_estimate, hll_registers, hll_tokens
from .dedup_stream import documents_stream


def run_hll_maintenance(spark: SparkSession, docs_stream: DataFrame) -> DataFrame:
    snap_root = tempfile.mkdtemp(prefix="snap_hll_")
    state: dict[str, str | None] = {"path": None}

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        part = hll_registers(hll_tokens(batch_df))
        if state["path"] is not None:
            prev = batch_df.sparkSession.read.parquet(state["path"])
            part = (
                prev.unionByName(part)
                .groupBy("source", "bucket")
                .agg(F.max("m_reg").alias("m_reg"))
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
    regs = spark.read.parquet(state["path"])
    return hll_estimate(regs)


def streaming_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_hll_maintenance(
        spark, documents_stream(spark, sf_dir).select("source", "text")
    )
