"""Event-stream analytics on the ``events`` table — the batch faces of
the engine's streaming surface (SURVEY.md §2.9: the reference is
batch-only; these are the standard event-time operators a work-queue /
event pipeline needs, with Structured Streaming variants in
``ast_data_pipeline_spark/streaming``).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.exact import davg, davg_sql, dsum, dsum_sql
from ..registry import register
from ..sources.catalog import load

SESSION_GAP_MIN = 30


@register(
    "e_tumbling_window_agg",
    oracle=f"""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*)::BIGINT AS n_events,
       {dsum_sql('value')} AS sum_value
FROM events
GROUP BY 1, 2
""",
    doc="Tumbling event-time window aggregate (batch face of the "
    "Structured Streaming windowed agg; window start == hour truncation).",
    tags=("events", "window", "bench"),
)
def e_tumbling_window_agg(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "e_sessionize",
    oracle=f"""
WITH g AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR floor(epoch(ts))::BIGINT - floor(epoch(lag(ts) OVER w))::BIGINT
                   > {SESSION_GAP_MIN} * 60
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, event_id, ts,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id
  FROM g
)
SELECT user_id, session_id,
       count(*)::BIGINT AS n_events,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end
FROM s GROUP BY user_id, session_id
""",
    doc="Sessionization: lag(ts) gap > 30min starts a session; session id "
    "= running sum of boundaries. One shuffle on user_id; the window and "
    "the groupBy share the partitioning.",
    tags=("events", "window", "bench"),
)
def e_sessionize(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    is_new = F.when(gap.isNull() | (gap > SESSION_GAP_MIN * 60), 1).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        ev.withColumn("is_new", is_new)
        .withColumn("session_id", F.sum("is_new").over(run))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        )
    )


@register(
    "e_topk_users_by_value",
    oracle=f"""
SELECT user_id, total_value, n_events, rank
FROM (
  SELECT user_id,
         {dsum_sql('value')} AS total_value,
         count(*)::BIGINT AS n_events,
         row_number() OVER (ORDER BY {dsum_sql('value')} DESC, user_id)::INT AS rank
  FROM events GROUP BY user_id
)
WHERE rank <= 25
""",
    doc="Top-K entities by aggregate over the event stream — partial "
    "agg + a single top-k (TakeOrderedAndProject), no global sort.",
    tags=("events", "window"),
)
def e_topk_users_by_value(spark, sf_dir):
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    agg = ev.groupBy("user_id").agg(
        dsum("value").alias("total_value"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w = Window.orderBy(F.col("total_value").desc(), "user_id")
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 25)
    )


@register(
    "p_date_functions",
    oracle="""
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       year(o_orderdate)::INT AS y,
       month(o_orderdate)::INT AS m,
       day(o_orderdate)::INT AS d,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d') AS due_date,
       datediff('day', TIMESTAMP '1995-01-01', o_orderdate)::INT AS days_since_epoch0
FROM orders
""",
    doc="Date/time function surface: extraction, truncation, interval "
    "arithmetic, datediff — engine-portable date semantics.",
    tags=("projection", "dates"),
)
def p_date_functions(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.date_format(d, "yyyy-MM-dd").alias("order_date"),
        F.year(d).alias("y"),
        F.month(d).alias("m"),
        F.dayofmonth(d).alias("d"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.date_add(d.cast("date"), 90), "yyyy-MM-dd").alias("due_date"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch0"
        ),
    )


@register(
    "e_json_props_extract",
    oracle=f"""
SELECT event_type,
       count(*)::BIGINT AS n,
       sum(json_extract_string(props, '$.k')::INT)::BIGINT AS sum_k,
       {davg_sql("json_extract_string(props, '$.k')::INT")} AS avg_k
FROM events
GROUP BY event_type
""",
    doc="Semi-structured props extraction (get_json_object) + aggregate — "
    "the engine's JSON column face.",
    tags=("events",),
)
def e_json_props_extract(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            davg("k").alias("avg_k"),
        )
    )
