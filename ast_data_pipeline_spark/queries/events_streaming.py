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
from .dedup import _asym_oracle
from .temporal import OHLC_ORACLE as _OHLC_ORACLE
from .text import AC_KEYWORDS as _AC_KEYWORDS
from .text import PII_ORACLE

_AC_KEYWORDS_LIST = list(_AC_KEYWORDS)


@register(
    "s_stream_sessionize",
    # The batch e_sessionize gaps-and-islands oracle, adapted to the
    # streaming face: (a) session merging is INCLUSIVE at the boundary
    # — Spark merges session ranges that overlap OR touch, so an event
    # exactly gap after its predecessor JOINS the session (> 1800
    # starts a new one, the same rule as the batch query; proven by
    # the sf0.1 pair at exactly 30:00 apart, which session_window
    # merges — the earlier >= calibration at sf0.001/0.01 never saw a
    # boundary pair and guessed wrong);
    # (b) session_end is the WINDOW end (last_ts + gap), not max(ts);
    # (c) append mode emits only sessions finalized by the terminal
    # watermark: window_end <= max(ts) - delay. Hash-equal at
    # sf0.001/0.01/0.1.
    oracle="""
WITH g AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR floor(epoch(ts))::BIGINT - floor(epoch(lag(ts) OVER w))::BIGINT > 1800
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM g
),
sess AS (
  SELECT user_id,
         strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
         strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
         count(*)::BIGINT AS n_events,
         max(ts) AS last_ts
  FROM s GROUP BY user_id, sid
)
SELECT user_id, session_start, session_end, n_events FROM sess
WHERE last_ts + INTERVAL 30 MINUTE
      <= (SELECT max(ts) - INTERVAL 10 MINUTE FROM events)
""",
    doc="Gap-based streaming sessionization via session_window(ts, 30m) "
    "with a 10m watermark, append mode: emits only finalized sessions — "
    "the watermark-finalized subset of the batch e_sessionize result, "
    "now oracled exactly (gaps-and-islands + terminal-watermark cut).",
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


@register(
    "s_stream_pii_redact",
    # Stateless map => exactly-once file-source replay equals the batch
    # result, so the streaming face shares x_pii_redact's oracle.
    oracle=PII_ORACLE,
    doc="Streaming PII redaction: the documents table replayed as a "
    "file-source stream through the SAME enrich->count->redact "
    "projection as x_pii_redact (queries/text.pii_redact_frame), "
    "append mode. A stateless map needs no state store or watermark — "
    "the continuous-ingest shape of the curation pass, verified "
    "against the identical DuckDB oracle as the batch face.",
    tags=("streaming", "text", "quality"),
)
def s_stream_pii_redact(spark, sf_dir):
    from ..queries.text import pii_redact_frame
    from ..sources.catalog import table_path
    from ..streaming.workqueue import run_stream_to_batch

    schema = spark.read.parquet(table_path(sf_dir, "documents")).schema
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_dir)
    )
    return run_stream_to_batch(pii_redact_frame(stream), spark, "append")


@register(
    "s_stream_upsert_snapshot",
    oracle="""
SELECT user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
       event_type AS last_type,
       value AS last_value
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id
                           ORDER BY ts DESC, event_id DESC) = 1
""",
    doc="Streaming upsert (SCD1 'latest per key' snapshot) via "
    "foreachBatch — the production merge-sink pattern: each "
    "micro-batch argmaxes locally, merges against the previous "
    "versioned parquet snapshot, and writes a new version (the "
    "dataflow a Delta MERGE compiles to). Tie-breaks ride "
    "(ts, event_id) through the snapshot, so availableNow replay is "
    "bit-equal to the batch QUALIFY row_number()=1 twin regardless "
    "of micro-batch boundaries (multi-batch merge path pinned in "
    "tests/test_streaming.py).",
    tags=("streaming", "extension"),
)
def s_stream_upsert_snapshot(spark, sf_dir):
    from ..streaming.upsert import streaming_upsert_snapshot

    return streaming_upsert_snapshot(spark, sf_dir)


@register(
    "s_stream_ohlc",
    oracle=_OHLC_ORACLE,
    doc="Streaming OHLC downsample (file source -> 1-day window x user "
    "-> min_by/max_by state on the unique (ts, event_id) chain, "
    "complete mode) — reproduces the batch t_downsample_ohlc row for "
    "row under the same oracle. O(1) state per (user, day): four "
    "extremes and a count, merged associatively across micro-batches, "
    "so a 100 TB replay holds |users|x|days| scalars, not events.",
    tags=("streaming", "temporal"),
)
def s_stream_ohlc(spark, sf_dir):
    from ..streaming.workqueue import streaming_ohlc

    return streaming_ohlc(spark, sf_dir)


@register(
    "s_stream_incremental_dedup",
    oracle=_asym_oracle(),
    doc="Streaming incremental ingestion dedup: each micro-batch of "
    "new documents screens against the static catalog inside "
    "foreachBatch (exact hash join + asymmetric LSH band join + "
    "rejoin verify). Per-doc verdicts depend only on (doc, catalog), "
    "so the per-batch union is bit-equal to the batch "
    "x_incremental_dedup — same oracle; batch-boundary independence "
    "is additionally proven by a split-file replay pytest.",
    tags=("streaming", "dedup"),
)
def s_stream_incremental_dedup(spark, sf_dir):
    from ..streaming.dedup_stream import streaming_incremental_dedup

    return streaming_incremental_dedup(spark, sf_dir)


@register(
    "s_stream_agg_maintenance",
    # The oracle is the BATCH recompute over all events; the streaming
    # side maintained (count, decimal-sum) state across micro-batches
    # and must land on identical bits — the IVM associativity claim of
    # e_delta_agg_maintenance, proven on the streaming runtime.
    oracle="""
SELECT user_id, count(*)::BIGINT AS n_events,
       round(sum(value::DECIMAL(30,10)), 4)::DOUBLE AS total_value
FROM events GROUP BY user_id
""",
    doc="Streaming incremental view maintenance: per-user running "
    "(count, total) kept as a foreachBatch-merged state table with "
    "DECIMAL partial sums (round once at read) — batch-boundary "
    "independent by decimal associativity, hash-equal to the batch "
    "recompute the oracle runs. The streaming face of "
    "e_delta_agg_maintenance.",
    tags=("streaming", "extension"),
)
def s_stream_agg_maintenance(spark, sf_dir):
    from ..streaming.upsert import streaming_agg_maintenance

    return streaming_agg_maintenance(spark, sf_dir)


@register(
    "s_stream_hll_distinct",
    # The oracle is the BATCH sketch finalization over all documents
    # (the sketch-only columns of a_hyperloglog_eval): the streaming
    # side max-merged per-(source, bucket) registers across
    # micro-batches and must land on identical registers — max is
    # associative/commutative, the mergeability claim of every sketch
    # in the family, proven here on the streaming runtime.
    oracle=f"""
WITH toks AS (
  SELECT source, a[i - 1] || ' ' || a[i] AS tok
  FROM (SELECT source, string_split(lower(text), ' ') AS a FROM documents),
       LATERAL unnest(generate_series(2, len(a))) t(i)
  WHERE a[i - 1] <> '' AND a[i] <> ''
),
h AS (
  SELECT source, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS hv FROM toks
),
regs AS (
  SELECT source, hv // {4503599627370496} AS bucket,
         max(CASE WHEN hv % {4503599627370496} = 0 THEN 53
                  ELSE 53 - length(regexp_replace(bin(hv % {4503599627370496}),
                                                  '^0+', '')) END) AS m_reg
  FROM h GROUP BY 1, 2
),
sums AS (
  SELECT source, count(*)::BIGINT AS n_filled,
         sum((1::BIGINT << (53 - m_reg)))::BIGINT AS s_filled
  FROM regs GROUP BY 1
)
SELECT source, n_filled AS n_registers_filled,
       CASE WHEN (256 - n_filled) > 0
             AND {0.7213 / (1.0 + 1.079 / 256) * 256 * 256 * float(1 << 53)!r}
                 / (s_filled + (256 - n_filled)::BIGINT * {1 << 53})::DOUBLE
                 <= {2.5 * 256!r}
            THEN 256.0::DOUBLE
                 * printf('%.7f', ln(256.0::DOUBLE / (256 - n_filled)))::DOUBLE
            ELSE {0.7213 / (1.0 + 1.079 / 256) * 256 * 256 * float(1 << 53)!r}
                 / (s_filled + (256 - n_filled)::BIGINT * {1 << 53})::DOUBLE
            END AS hll_est
FROM sums
""",
    doc="Streaming HyperLogLog maintenance: per-(source, bucket) "
    "registers MAX-merged across micro-batches in foreachBatch, "
    "estimate finalized at read — register max is associative, so "
    "the maintained sketch is bit-identical to the batch build the "
    "oracle runs (the mergeable-sketch claim proven on the streaming "
    "runtime; kilobytes of standing state per group at any scale).",
    tags=("streaming", "stats", "extension"),
)
def s_stream_hll_distinct(spark, sf_dir):
    from ..streaming.sketches_stream import streaming_hll_distinct

    return streaming_hll_distinct(spark, sf_dir)


@register(
    "s_stream_exactly_once_dedup",
    # The oracle is the exactly-once expectation: per event type, the
    # distinct event count of the original feed — the streaming side
    # consumed an at-least-once feed (every 3rd event duplicated) and
    # must emit each event_id exactly once. n_events == n_distinct in
    # the output doubles as the internal consistency proof.
    oracle="""
SELECT event_type, count(DISTINCT event_id)::BIGINT AS n_events,
       count(DISTINCT event_id)::BIGINT AS n_distinct
FROM events GROUP BY event_type
""",
    doc="Exactly-once delivery from an at-least-once feed: "
    "withWatermark + dropDuplicatesWithinWatermark(event_id) — "
    "BOUNDED dedup state (keys expire once the watermark passes), "
    "unlike bare dropDuplicates whose state grows forever. The "
    "deduped stream appends to a parquet sink per micro-batch and "
    "the per-type census must equal the original feed's distinct "
    "counts. The eleventh streaming face; the redelivery model is "
    "every 3rd event duplicated.",
    tags=("streaming", "extension"),
)
def s_stream_exactly_once_dedup(spark, sf_dir):
    from ..streaming.dedup_stream import streaming_exactly_once_dedup

    return streaming_exactly_once_dedup(spark, sf_dir)


@register(
    "s_stream_keyword_tagging",
    # The oracle is the BATCH keyword census (x_keyword_tagging_ac's
    # oracle verbatim): the streaming side tags each micro-batch with
    # the broadcast Aho-Corasick automaton and ADDS the per-(source,
    # keyword) partials into standing state — counts are associative,
    # so maintained == batch regardless of micro-batching. Twelfth
    # streaming face; state is bounded by the tag vocabulary.
    oracle=f"""
WITH kw AS (SELECT unnest({_AC_KEYWORDS_LIST!r}) AS keyword),
per_doc AS (
  SELECT d.source, k.keyword,
         ((len(d.t) - len(replace(d.t, k.keyword, ''))) // len(k.keyword))::BIGINT AS n
  FROM (SELECT source, lower(text) AS t FROM documents) d CROSS JOIN kw k
)
SELECT source, keyword,
       count(*)::BIGINT AS n_docs,
       sum(n)::BIGINT AS n_matches
FROM per_doc WHERE n > 0
GROUP BY source, keyword
""",
    doc="Streaming keyword-census maintenance: per-batch Aho-Corasick "
    "tagging merged into a (source, keyword)-keyed standing state by "
    "count addition in foreachBatch; the final state must equal the "
    "batch census bit-for-bit. The automaton broadcasts with the "
    "closure; state is tag-vocabulary-sized, independent of corpus "
    "size.",
    tags=("streaming", "text", "extension"),
)
def s_stream_keyword_tagging(spark, sf_dir):
    from ..streaming.tagging_stream import streaming_keyword_tagging

    return streaming_keyword_tagging(spark, sf_dir)


@register(
    "s_stream_custom_state",
    # The oracle is the batch per-user profile; the streaming side
    # maintains per-key state in the engine's state store via
    # applyInPandasWithState. s_stream_stateful_counter already
    # exercises that API for a single integer counter; this face adds
    # the MULTI-METRIC profile shape (mixed-type state tuple) and,
    # more importantly, the monotone-reduce discipline: every tracked
    # quantity only grows, so the Update-mode output stream reduces
    # to the final profile by element-wise max for ANY micro-batching
    # — pinned by a 3-batch replay test
    # (tests/test_streaming_dedup.py).
    oracle="""
SELECT user_id,
       count(*)::BIGINT AS n_events,
       sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT
         AS n_purchases,
       max(value) AS max_value
FROM events GROUP BY user_id
""",
    doc="Custom stateful streaming via applyInPandasWithState: "
    "per-user lifetime profile (event count, purchase count, running "
    "max) held as engine-managed state and updated from Arrow "
    "batches; monotone counters make the Update-mode stream reduce "
    "deterministically to the batch profile under any micro-batching. "
    "Thirteenth streaming face.",
    tags=("streaming", "extension"),
)
def s_stream_custom_state(spark, sf_dir):
    from ..streaming.custom_state import streaming_user_profile

    return streaming_user_profile(spark, sf_dir)


@register(
    "s22_event_replay_stream_source",
    # A custom Python STREAMING source (Spark 4 DataSource API,
    # SimpleDataSourceStreamReader): the events table replayed as
    # offset-tracked micro-batches of 2000 event_ids — initialOffset /
    # read(start) / readBetweenOffsets give exactly-once, recoverable
    # chunks, and the complete-mode census over the fully-drained
    # stream must equal the batch aggregate. Completes the DataSource
    # API matrix (batch reader s20, batch writer s21, stream reader
    # here); the replay-source shape is how a backfill or test feed
    # enters a streaming pipeline. Implementation notes the API's
    # sharp edge: the prefetch cache both next()s and copy()s the
    # returned object, so read() must yield a list ITERATOR.
    oracle="""
SELECT event_type,
       count(*)::BIGINT AS n_events,
       max(value) AS max_value,
       min(event_id)::BIGINT AS min_event_id,
       max(event_id)::BIGINT AS max_event_id
FROM events GROUP BY event_type
""",
    doc="Custom streaming source via the Python DataSource API: "
    "offset-chunked replay of the events table (exactly-once, "
    "recoverable via readBetweenOffsets), drained to a complete-mode "
    "census that must equal batch. Fourteenth streaming face; with "
    "s20/s21 the Python DataSource matrix (batch read, batch write, "
    "stream read) is fully exercised.",
    tags=("streaming", "source", "extension"),
)
def s22_event_replay_stream_source(spark, sf_dir):
    from ..streaming.custom_state import run_event_replay_census

    return run_event_replay_census(spark, sf_dir)


@register(
    "s_stream_stream_left_join",
    # The left-outer twin of s_stream_stream_join. The null side is
    # watermark-governed: an unmatched click's null row emits only
    # when the watermark passes its last joinable instant (p_ts <= ts
    # -> expiry at watermark > ts). The query-global watermark is the
    # MIN across both watermark columns (multipleWatermarkPolicy=min:
    # each side tracks its own max event time), so under availableNow
    # replay the result is every matched pair PLUS null rows for
    # unmatched clicks with ts < least(max click ts, max purchase ts)
    # - 10 min — measured: the final click itself never null-emits
    # because it IS the click-side max. Clicks above
    # the final watermark remain unemitted state — the oracle pins
    # that real semantics line instead of pretending batch LEFT JOIN
    # equivalence (same honesty rule as s_stream_sessionize's
    # append-mode finalization).
    oracle="""
WITH c AS (SELECT * FROM events WHERE event_type = 'click'),
p AS (SELECT * FROM events WHERE event_type = 'purchase'),
wm AS (SELECT least((SELECT max(ts) FROM c), (SELECT max(ts) FROM p))
              - INTERVAL 10 MINUTE AS final_wm),
matched AS (
  SELECT c.event_id, c.user_id,
         strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
         p.event_id AS p_event_id,
         strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
         p.value
  FROM c JOIN p ON c.user_id = p.user_id
   AND p.ts >= c.ts - INTERVAL '1 hour' AND p.ts <= c.ts
),
unmatched AS (
  SELECT c.event_id, c.user_id,
         strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
         NULL::BIGINT AS p_event_id,
         NULL::VARCHAR AS purchase_ts,
         NULL::DOUBLE AS value
  FROM c, wm
  WHERE c.ts < wm.final_wm
    AND NOT EXISTS (
      SELECT 1 FROM p WHERE p.user_id = c.user_id
        AND p.ts >= c.ts - INTERVAL '1 hour' AND p.ts <= c.ts)
)
SELECT * FROM matched UNION ALL SELECT * FROM unmatched
""",
    doc="Stream-stream LEFT OUTER join with dual watermarks: matched "
    "pairs equal the inner join; null rows appear exactly for "
    "unmatched clicks whose state expired below the final watermark "
    "(min of the two sides' max event times, minus 10 min) — the "
    "watermark-expiry emission rule pinned "
    "against a DuckDB mirror of that exact semantics. 15th streaming "
    "face.",
    tags=("streaming", "join"),
)
def s_stream_stream_left_join(spark, sf_dir):
    from ..streaming.workqueue import streaming_stream_stream_left_join

    return streaming_stream_stream_left_join(spark, sf_dir)
