"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY §2.9 stretch; the Spark-native home for per-key custom state
the reference keeps in mutable numpy arrays).

The operator keeps a per-user running counter (event count + integer
sum of the JSON ``k`` property) in GroupState and emits the updated
totals every batch. State is integer-only so results are exactly
reproducible — the file-source run emits one final row per user that
must equal the batch aggregate (the oracle).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .workqueue import _events_stream, run_stream_to_batch

OUT_SCHEMA = "user_id long, n_events long, sum_k long"
STATE_SCHEMA = "n long, s long"


def _update_counter(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, s = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        s += int(pdf["k"].sum())
    state.update((n, s))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_k": [s]})


def streaming_user_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_stream(spark, sf_dir).select(
        "user_id", F.get_json_object("props", "$.k").cast("long").alias("k")
    )
    counted = ev.groupBy("user_id").applyInPandasWithState(
        _update_counter,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return run_stream_to_batch(counted, spark, "update")
