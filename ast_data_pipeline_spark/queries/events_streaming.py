"""Streaming query surface — streaming executions checked against the
SAME DuckDB oracles as their batch twins (exactly-once file-source
semantics make the results identical).
"""

from __future__ import annotations

from ..functions.exact import dsum_sql
from ..registry import register
from ..streaming.workqueue import (
    streaming_sessionize,
    streaming_tumbling_agg,
    streaming_workqueue_snapshot,
)


@register(
    "s_stream_sessionize",
    oracle=None,  # append mode withholds watermark-open tail sessions;
    # containment vs the batch twin is pytest-checked (test_streaming.py)
    doc="Gap-based streaming sessionization via session_window(ts, 30m) "
    "with a 10m watermark, append mode: emits only finalized sessions — "
    "a strict subset of the batch e_sessionize result by design.",
    tags=("streaming", "window"),
)
def s_stream_sessionize(spark, sf_dir):
    return streaming_sessionize(spark, sf_dir)


@register(
    "s_stream_tumbling_agg",
    oracle=f"""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*)::BIGINT AS n_events,
       {dsum_sql('value')} AS sum_value
FROM events
GROUP BY 1, 2
""",
    doc="Structured Streaming tumbling-window aggregate (file source -> "
    "window(ts, 1h) -> memory sink, availableNow trigger) — verified "
    "against the same oracle as the batch twin: streaming and batch "
    "must agree exactly.",
    tags=("streaming",),
)
def s_stream_tumbling_agg(spark, sf_dir):
    return streaming_tumbling_agg(spark, sf_dir)


@register(
    "s_stream_stateful_counter",
    oracle="""
SELECT user_id,
       count(*)::BIGINT AS n_events,
       sum(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS sum_k
FROM events
GROUP BY user_id
""",
    doc="Custom stateful streaming operator (applyInPandasWithState): "
    "per-user GroupState counter over the event stream; the final "
    "update-mode emission must equal the batch aggregate (integer "
    "state -> exact parity).",
    tags=("streaming", "stateful"),
)
def s_stream_stateful_counter(spark, sf_dir):
    from ..streaming.stateful import streaming_user_counters

    return streaming_user_counters(spark, sf_dir)


@register(
    "s_stream_workqueue",
    oracle="""
SELECT queue, count(*)::BIGINT AS n,
       min(event_id)::BIGINT AS min_event_id,
       max(event_id)::BIGINT AS max_event_id
FROM (
  SELECT event_id,
         CASE WHEN event_id % 5 = 0 THEN 'labeled' ELSE 'remaining' END AS queue
  FROM events
)
GROUP BY queue
""",
    doc="The reference's remaining/labeled work-queue (src/az_proc.py:"
    "423-445) as an append-only stream: per-record routing in streaming "
    "mode, snapshot aggregated after completion.",
    tags=("streaming",),
)
def s_stream_workqueue(spark, sf_dir):
    return streaming_workqueue_snapshot(spark, sf_dir)
