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


@register(
    "s_stream_dedup",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
    doc="Streaming deduplication: dropDuplicates(user_id, event_type) "
    "over the event stream (state-store keyed dedup, append mode); "
    "emitting only key columns makes the result order-insensitive and "
    "exactly equal to batch SELECT DISTINCT.",
    tags=("streaming",),
)
def s_stream_dedup(spark, sf_dir):
    from ..streaming.workqueue import streaming_distinct_pairs

    return streaming_distinct_pairs(spark, sf_dir)


@register(
    "s_stream_static_join",
    oracle=f"""
SELECT c.c_mktsegment,
       count(*)::BIGINT AS n_events,
       {dsum_sql('e.value')} AS sum_value
FROM events e JOIN customer c ON e.user_id + 1 = c.c_custkey
GROUP BY 1
""",
    doc="Stream-static join: per-micro-batch broadcast of the customer "
    "dim onto the event stream, aggregated per market segment in "
    "complete mode — equals the batch join exactly.",
    tags=("streaming", "join"),
)
def s_stream_static_join(spark, sf_dir):
    from ..streaming.workqueue import streaming_static_join_agg

    return streaming_static_join_agg(spark, sf_dir)


@register(
    "s_stream_stream_join",
    oracle="""
SELECT c.event_id, c.user_id,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
       p.event_id AS p_event_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       p.value
FROM (SELECT * FROM events WHERE event_type = 'click') c
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts - INTERVAL '1 hour' AND p.ts <= c.ts
""",
    doc="Stream-stream inner join with dual watermarks and a 1-hour "
    "event-time range condition (bounded join state). availableNow "
    "replay must emit exactly the batch theta-join result.",
    tags=("streaming", "join"),
)
def s_stream_stream_join(spark, sf_dir):
    from ..streaming.workqueue import streaming_stream_stream_join

    return streaming_stream_stream_join(spark, sf_dir)
