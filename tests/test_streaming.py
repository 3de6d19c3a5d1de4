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
