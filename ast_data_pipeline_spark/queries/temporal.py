"""Temporal-join queries over ``events``: as-of join and interval
(range) join.  Not present in the reference (its pipelines are
file-batch; see SURVEY §2.9) — added as first-class engine surface for
event-time analytics, with DuckDB ``ASOF JOIN`` / theta-join oracles
as independent formulations.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ast_data_pipeline_spark.lineage import lineage_cut_lazy

from ..functions.exact import davg_sql, dsum, dsum_over_sql, dsum_sql
from ..operators.temporal import asof_join, range_join_binned
from ..registry import register
from ..sources.catalog import load


@register(
    "t_asof_join",
    oracle="""
SELECT a.event_id,
       a.user_id,
       strftime(a.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
       b.event_id AS purchase_event_id,
       b.value    AS purchase_value
FROM (SELECT * FROM events WHERE event_type = 'click') a
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
  ON a.user_id = b.user_id AND a.ts >= b.ts
""",
    doc="Backward as-of join: each click picks the user's most recent "
    "purchase at-or-before it. Spark side is the union+window plan "
    "(one shuffle on user_id, no pair explosion); the oracle is "
    "DuckDB's native ASOF JOIN — an independent engine formulation.",
    tags=("temporal", "join", "bench"),
)
def t_asof_join(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    joined = asof_join(
        clicks,
        purchases.withColumnRenamed("event_id", "p_event_id"),
        on=["user_id"],
        ts_col="ts",
        payload_cols=["p_event_id", "value"],
        suffix="",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.col("p_event_id").alias("purchase_event_id"),
        F.col("value").alias("purchase_value"),
    )


@register(
    "t_range_join",
    oracle=f"""
WITH days AS (
  SELECT unnest(generate_series(TIMESTAMP '2024-01-01',
                                TIMESTAMP '2024-01-30',
                                INTERVAL '1 day')) AS day
),
iv AS (
  SELECT day, day + INTERVAL '9 hours' AS start_ts,
              day + INTERVAL '17 hours' AS end_ts
  FROM days
)
SELECT strftime(iv.day, '%Y-%m-%d') AS window_day,
       count(*)::BIGINT AS n_events,
       count(DISTINCT e.user_id)::BIGINT AS n_users,
       {dsum_sql('e.value')} AS sum_value
FROM events e
JOIN iv ON e.ts >= iv.start_ts AND e.ts < iv.end_ts
GROUP BY 1
""",
    doc="Point-in-interval range join: events falling inside each day's "
    "09:00-17:00 business window. Spark side bins both sides to hour "
    "buckets and equi-joins on bucket (hash shuffle, no "
    "BroadcastNestedLoopJoin) + residual range filter; the oracle is a "
    "plain theta join.",
    tags=("temporal", "join"),
)
def t_range_join(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    iv = (
        spark.range(1)
        .select(
            F.explode(
                F.expr(
                    "sequence(timestamp'2024-01-01 00:00:00',"
                    " timestamp'2024-01-30 00:00:00', interval 1 day)"
                )
            ).alias("day")
        )
        .select(
            "day",
            F.expr("day + interval 9 hours").alias("start_ts"),
            F.expr("day + interval 17 hours").alias("end_ts"),
        )
    )
    joined = range_join_binned(
        ev, iv, ts_col="ts", start_col="start_ts", end_col="end_ts",
        bucket="1 hour",
    )
    return joined.groupBy(
        F.date_format("day", "yyyy-MM-dd").alias("window_day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        dsum("value").alias("sum_value"),
    )


@register(
    "t_interval_union_length",
    # Classic interval-union sweep: each event spans [ts, ts+30min);
    # overlapping/touching spans merge; report per-user covered
    # seconds. Island rule: a span starts a new island iff its start
    # exceeds the RUNNING MAX of all previous ends (a plain lag is
    # wrong when an early long span swallows later short ones).
    # Integer epoch arithmetic throughout.
    oracle="""
WITH iv AS (
  SELECT user_id, event_id,
         floor(epoch(ts))::BIGINT AS s,
         floor(epoch(ts))::BIGINT + 1800 AS e
  FROM events
),
g AS (
  SELECT user_id, event_id, s, e,
         CASE WHEN s > coalesce(max(e) OVER (
                PARTITION BY user_id ORDER BY s, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS is_new
  FROM iv
),
isl AS (
  SELECT user_id, s, e,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY s, event_id
                           ROWS UNBOUNDED PRECEDING) AS island
  FROM g
),
per AS (
  SELECT user_id, island,
         max(e) - min(s) AS covered
  FROM isl GROUP BY 1, 2
)
SELECT user_id,
       count(*)::BIGINT AS n_islands,
       sum(covered)::BIGINT AS covered_seconds
FROM per GROUP BY user_id
""",
    doc="Interval-union length per user: every event opens a 30-minute "
    "span; overlapping spans merge into islands via the running-max-"
    "of-ends rule (a lag-based gap test is wrong when one long span "
    "swallows several later ones), and the report is islands + total "
    "covered seconds — the utilization/uptime calculation interval "
    "algebra exists for. One user-key shuffle shared by both windows "
    "and the aggregates; integer epoch seconds keep it exact.",
    tags=("temporal", "extension"),
)
def t_interval_union_length(spark, sf_dir):
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        "event_id",
        F.col("ts").cast("long").alias("s"),
        (F.col("ts").cast("long") + 1800).alias("e"),
    )
    w = Window.partitionBy("user_id").orderBy("s", "event_id")
    prev_max_e = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    g = iv.withColumn(
        "is_new",
        F.when(F.col("s") > F.coalesce(prev_max_e, F.lit(-1)), 1).otherwise(0),
    )
    # both windows MUST share the unique (s, event_id) order: ordering
    # the island sum by the non-unique (s, e) lets tied rows land in
    # different islands depending on engine-internal sort stability
    w_run = Window.partitionBy("user_id").orderBy("s", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    isl = g.withColumn("island", F.sum("is_new").over(w_run))
    per = isl.groupBy("user_id", "island").agg(
        (F.max("e") - F.min("s")).alias("covered")
    )
    return per.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum("covered").cast("long").alias("covered_seconds"),
    )


# Shared by the batch query below and the streaming twin
# (s_stream_ohlc): both must reproduce this exactly.
OHLC_ORACLE = """
WITH r AS (
  SELECT user_id,
         strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         value,
         row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT user_id, day,
       max(CASE WHEN rn_a = 1 THEN value END) AS open,
       max(value) AS high,
       min(value) AS low,
       max(CASE WHEN rn_d = 1 THEN value END) AS close,
       count(*)::BIGINT AS n_events
FROM r GROUP BY user_id, day
"""


@register(
    "t_downsample_ohlc",
    # OHLC downsampling: per (user, day) bucket report the opening and
    # closing `value` plus high/low — the canonical time-series
    # resample. Open/close are picked by row_number over the unique
    # (ts, event_id) chain rather than arg_min/arg_max so tie handling
    # is engine-independent; high/low/count are plain aggregates. All
    # measures pass through unchanged (no float arithmetic), so the
    # hash gate is exact without decimal staging.
    oracle=OHLC_ORACLE,
    doc="Time-bucket OHLC downsample of the event stream: one shuffle "
    "on (user_id, day) shared by both row_number windows and the final "
    "aggregate (Exchange reuse — the groupBy keys equal the window "
    "partition keys, so Spark adds no second exchange). At 100 TB the "
    "bucket count is |users|×|days|, far above the executor count, so "
    "no single-reducer ceiling; values pass through bit-exact.",
    tags=("temporal", "window", "extension"),
)
def t_downsample_ohlc(spark, sf_dir):
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    base = ev.select(
        "user_id", "event_id", "ts", "value", day.alias("day_ts")
    )
    w_asc = Window.partitionBy("user_id", "day_ts").orderBy("ts", "event_id")
    w_desc = Window.partitionBy("user_id", "day_ts").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    r = base.select(
        "user_id",
        "day_ts",
        "value",
        F.row_number().over(w_asc).alias("rn_a"),
        F.row_number().over(w_desc).alias("rn_d"),
    )
    # group on day_ts (the windows' partition expression), not the
    # formatted string: grouping on date_format(day_ts) is a different
    # expression, which forces a second Exchange — keeping the key
    # identical lets the aggregate reuse the windows' partitioning
    # (pinned in tests/test_scale_knobs.py), and the string is derived
    # afterwards.
    return (
        r.groupBy("user_id", "day_ts")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "user_id",
            F.date_format("day_ts", "yyyy-MM-dd").alias("day"),
            "open",
            "high",
            "low",
            "close",
            "n_events",
        )
    )


@register(
    "t_resample_ffill",
    # Forward-fill resample: the user's last observed daily close
    # carried across inactive days — the other half of calendar
    # densification next to e_gap_fill_daily's zero-fill (counts
    # zero-fill; prices/levels forward-fill). Daily close is picked by
    # the unique (ts DESC, event_id DESC) row_number chain; the fill
    # is last_value(IGNORE NULLS) over the per-user calendar, which
    # never yields NULL because each grid starts at the user's first
    # active day. Sampled to user_id % 50 = 0 like the gap-fill twin.
    oracle="""
WITH r AS (
  SELECT user_id, ts::DATE AS day, value,
         row_number() OVER (PARTITION BY user_id, ts::DATE
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE user_id % 50 = 0
),
dc AS (
  SELECT user_id, day, value AS close FROM r WHERE rn = 1
),
span AS (
  SELECT user_id, min(day) AS d0, max(day) AS d1 FROM dc GROUP BY 1
),
grid AS (
  SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
  FROM span
)
SELECT g.user_id, strftime(g.day, '%Y-%m-%d') AS day,
       last_value(dc.close IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS close_ffill,
       (dc.user_id IS NULL) AS gap_filled
FROM grid g LEFT JOIN dc ON g.user_id = dc.user_id AND g.day = dc.day
""",
    doc="Forward-fill calendar resample of each sampled user's daily "
    "closing value: daily close (one user-key shuffle shared with the "
    "span agg), per-user calendar grid via sequence()+explode (map-"
    "side, never a calendar cross join), left join back on the same "
    "key, then last_value(IGNORE NULLS) running fill. Values pass "
    "through bit-exact; at 100 TB the state per window partition is "
    "one user's day count, so no reducer ceiling.",
    tags=("temporal", "window", "extension"),
)
def t_resample_ffill(spark, sf_dir):
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").filter(F.col("user_id") % 50 == 0)
    w_day = Window.partitionBy("user_id", F.to_date("ts")).orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    dc = (
        ev.select(
            "user_id",
            F.to_date("ts").alias("day"),
            "value",
            F.row_number().over(w_day).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select("user_id", "day", F.col("value").alias("close"))
    )
    span = dc.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = span.select(
        "user_id",
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day"),
    )
    j = grid.join(dc, ["user_id", "day"], "left")
    w_fill = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.last("close", ignorenulls=True).over(w_fill).alias("close_ffill"),
        F.col("close").isNull().alias("gap_filled"),
    )


@register(
    "t_asof_nearest",
    # Nearest-event as-of join: each click pairs with the user's
    # temporally CLOSEST purchase, before or after (sensor/telemetry
    # alignment; t_asof_join is the backward-only case). Selection
    # rule, stated once and mirrored in both engines: argmin over
    # (|dt_us|, purchase_ts, purchase_event_id) — the unique chain
    # that breaks an exact-distance tie toward the earlier (backward)
    # purchase and an equal-timestamp collision toward the smaller id.
    # Integer microsecond arithmetic throughout.
    oracle="""
SELECT c.event_id, c.user_id,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
       n.p_event_id, n.p_value, n.dt_us
FROM (SELECT * FROM events WHERE event_type = 'click') c
LEFT JOIN LATERAL (
  SELECT p.event_id AS p_event_id, p.value AS p_value,
         epoch_us(p.ts) - epoch_us(c.ts) AS dt_us
  FROM events p
  WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
  ORDER BY abs(epoch_us(p.ts) - epoch_us(c.ts)), epoch_us(p.ts), p.event_id
  LIMIT 1
) n ON TRUE
""",
    doc="Nearest-neighbor temporal join via the union+window plan: "
    "purchases and clicks interleave in one user_id shuffle; a "
    "forward and a backward last_value(IGNORE NULLS) window over the "
    "SAME partition key pick the two candidates (tie-breaks encoded "
    "in the sort: equal-timestamp purchases order so the window picks "
    "the smallest event_id), then a row-local comparison keeps the "
    "closer one. No pair explosion, one exchange; the oracle is "
    "DuckDB's LATERAL argmin — an independent formulation.",
    tags=("temporal", "join", "extension"),
)
def t_asof_nearest(spark, sf_dir):
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.unix_micros("ts").alias("t"),
        F.lit(0).alias("is_click"),
        F.col("event_id").alias("pid"),
        F.col("value").alias("pvalue"),
        F.lit(None).cast("long").alias("cid"),
        F.lit(None).cast("timestamp").alias("cts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.unix_micros("ts").alias("t"),
        F.lit(1).alias("is_click"),
        F.lit(None).cast("long").alias("pid"),
        F.lit(None).cast("double").alias("pvalue"),
        F.col("event_id").alias("cid"),
        F.col("ts").alias("cts"),
    )
    u = purch.unionByName(clicks)
    p_struct = F.when(
        F.col("is_click") == 0, F.struct("t", "pid", "pvalue")
    )
    # backward: inclusive (purchase at the click's own ts counts) ->
    # purchases sort BEFORE the click at equal t (is_click asc); among
    # equal-t purchases, pid DESC puts the smallest id last, which is
    # what last_value picks
    w_back = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t").asc(), F.col("is_click").asc(), F.col("pid").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward: strict (purchase at the click's own ts excluded) -> in
    # t-DESC order the click sorts BEFORE equal-t purchases
    # (is_click desc); pid DESC again leaves the smallest id last
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t").desc(), F.col("is_click").desc(), F.col("pid").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = u.select(
        "user_id", "t", "is_click", "cid", "cts",
        F.last(p_struct, ignorenulls=True).over(w_back).alias("back"),
        F.last(p_struct, ignorenulls=True).over(w_fwd).alias("fwd"),
    ).filter(F.col("is_click") == 1)
    d_back = F.col("t") - F.col("back.t")
    d_fwd = F.col("fwd.t") - F.col("t")
    use_back = F.col("back").isNotNull() & (
        F.col("fwd").isNull() | (d_back <= d_fwd)
    )
    chosen = F.when(use_back, F.col("back")).otherwise(F.col("fwd"))
    return marked.select(
        F.col("cid").alias("event_id"),
        "user_id",
        F.date_format("cts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        chosen["pid"].alias("p_event_id"),
        chosen["pvalue"].alias("p_value"),
        (chosen["t"] - F.col("t")).alias("dt_us"),
    )


@register(
    "t_peak_concurrency",
    # Sweep-line peak concurrency: every event opens a 30-minute span;
    # the report is each day's maximum number of simultaneously-open
    # spans across all users — the capacity number (license seats,
    # connection pools) interval OVERLAP counting exists for, distinct
    # from t_interval_union_length's coverage. +1/-1 deltas sweep in
    # (t, delta, event_id) order — ends sort before starts at the same
    # instant, so touching spans never count as concurrent. The
    # running count is a TWO-LEVEL prefix sum (per-day offsets over
    # the tiny day table + in-day cumulatives), never a single-reducer
    # global window; midnight carry-over rides the day offsets.
    oracle="""
WITH d AS (
  SELECT floor(epoch(ts))::BIGINT AS t, 1 AS delta, event_id FROM events
  UNION ALL
  SELECT floor(epoch(ts))::BIGINT + 1800, -1, event_id FROM events
),
r AS (
  SELECT t, delta,
         sum(delta) OVER (ORDER BY t, delta, event_id
                          ROWS UNBOUNDED PRECEDING)::BIGINT AS open_now
  FROM d
)
SELECT strftime(to_timestamp(t), '%Y-%m-%d') AS day,
       max(open_now)::BIGINT AS peak_concurrency,
       sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END)::BIGINT AS n_opens
FROM r GROUP BY 1
""",
    doc="Daily peak simultaneous-span count via a distributed "
    "sweep-line: delta events bucket by day, per-day net sums prefix "
    "over the ~30-row day table (broadcast back as offsets), and the "
    "in-day running count + max run per day-partition — the "
    "global-order sweep decomposes exactly because the day is a "
    "PREFIX of the (t, delta, event_id) ordering.",
    tags=("temporal", "window", "extension"),
)
def t_peak_concurrency(spark, sf_dir):
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    t = F.col("ts").cast("long")
    d = ev.select(
        t.alias("t"), F.lit(1).alias("delta"), "event_id"
    ).unionByName(
        ev.select((t + 1800).alias("t"), F.lit(-1).alias("delta"), "event_id")
    ).withColumn("day_ts", F.to_date(F.timestamp_seconds(F.col("t"))))
    per_day = d.groupBy("day_ts").agg(F.sum("delta").alias("net"))
    w_days = Window.orderBy("day_ts").rowsBetween(Window.unboundedPreceding, -1)
    off = per_day.select(
        "day_ts",
        F.coalesce(F.sum("net").over(w_days), F.lit(0)).alias("carry_in"),
    )
    w_in = (
        Window.partitionBy("day_ts")
        .orderBy("t", "delta", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = d.join(F.broadcast(off), "day_ts").select(
        "day_ts",
        "delta",
        (F.col("carry_in") + F.sum("delta").over(w_in)).alias("open_now"),
    )
    return r.groupBy(
        F.date_format("day_ts", "yyyy-MM-dd").alias("day")
    ).agg(
        F.max("open_now").cast("long").alias("peak_concurrency"),
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_opens"),
    )


ASOF_TOL_S = 6 * 3600  # 6-hour match tolerance


@register(
    "t_asof_tolerance",
    # As-of join with tolerance (pandas merge_asof(tolerance=...)):
    # the backward match only counts if the purchase happened within
    # 6 hours of the click — stale state is worse than no state in
    # feature pipelines. Same union+window plan as t_asof_join; the
    # tolerance is a row-local null-out after the pick, so the plan
    # shape (one user-key exchange, no pair explosion) is unchanged.
    oracle=f"""
SELECT a.event_id,
       a.user_id,
       CASE WHEN epoch(a.ts) - epoch(b.ts) <= {ASOF_TOL_S}
            THEN b.event_id END AS purchase_event_id,
       CASE WHEN epoch(a.ts) - epoch(b.ts) <= {ASOF_TOL_S}
            THEN b.value END AS purchase_value,
       (b.event_id IS NOT NULL
        AND epoch(a.ts) - epoch(b.ts) > {ASOF_TOL_S}) AS match_expired
FROM (SELECT * FROM events WHERE event_type = 'click') a
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
  ON a.user_id = b.user_id AND a.ts >= b.ts
""",
    doc="Tolerance-bounded backward as-of join: each click keeps its "
    "most recent purchase only when it is at most 6 hours old, and "
    "reports expired matches separately (the staleness census). "
    "Union+window plan, one user_id exchange; the integer-epoch "
    "tolerance test is a codegen projection.",
    tags=("temporal", "join", "extension"),
)
def t_asof_tolerance(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_event_id"), "user_id", "ts", "value"
    )
    # carry the purchase ts through the standard helper as a
    # pre-materialized column so the tolerance test stays row-local
    purchases = purchases.withColumn("p_ts_l", F.col("ts").cast("long"))
    joined = asof_join(
        clicks,
        purchases,
        on=["user_id"],
        ts_col="ts",
        payload_cols=["p_event_id", "value", "p_ts_l"],
        suffix="",
    )
    in_tol = (F.col("ts").cast("long") - F.col("p_ts_l")) <= ASOF_TOL_S
    return joined.select(
        "event_id",
        "user_id",
        F.when(in_tol, F.col("p_event_id")).alias("purchase_event_id"),
        F.when(in_tol, F.col("value")).alias("purchase_value"),
        (F.col("p_event_id").isNotNull() & ~in_tol).alias("match_expired"),
    )


# Truncated-EWMA weights: exact binary fractions (2^-k), written in
# scientific notation so BOTH engines parse them as DOUBLE (bare
# decimal literals parse as DECIMAL and shift the arithmetic type).
_EWMA_W = ["5e-1", "2.5e-1", "1.25e-1", "6.25e-2", "3.125e-2", "1.5625e-2", "7.8125e-3"]


def _ewma_exprs() -> tuple[str, str]:
    """(numerator, denominator) expression text shared verbatim by the
    Spark column and the DuckDB oracle: a fixed LEFT-ASSOCIATED chain
    of IEEE + and * (both bit-exact across engines), truncated at 7
    lags (weights 2^-1 .. 2^-7; the 2^-8 tail is dropped, and the
    denominator renormalizes over the lags actually present)."""
    num = "v0"
    den = "1e0"
    for k, w in enumerate(_EWMA_W, start=1):
        num = f"({num} + coalesce(v{k}, 0e0) * {w})"
        den = f"({den} + (CASE WHEN v{k} IS NULL THEN 0e0 ELSE {w} END))"
    return num, den


_EWMA_NUM, _EWMA_DEN = _ewma_exprs()

_EWMA_ORACLE = f"""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day, {dsum_sql('value')} AS v0
  FROM events GROUP BY 1, 2
),
lagged AS (
  SELECT event_type, day, v0,
         lag(v0, 1) OVER w AS v1, lag(v0, 2) OVER w AS v2,
         lag(v0, 3) OVER w AS v3, lag(v0, 4) OVER w AS v4,
         lag(v0, 5) OVER w AS v5, lag(v0, 6) OVER w AS v6,
         lag(v0, 7) OVER w AS v7
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day)
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day, v0 AS daily_value,
       {_EWMA_NUM} / {_EWMA_DEN} AS ewma
FROM lagged
"""


@register(
    "t_ewma",
    oracle=_EWMA_ORACLE,
    doc="Truncated exponentially-weighted moving average (alpha=1/2, "
    "7 lags) over the per-type daily value series. Weights are exact "
    "binary fractions, the weighted sum is one fixed left-associated "
    "chain of IEEE +/* (bit-exact in every engine), and the "
    "denominator renormalizes over present lags so the series head "
    "is well-defined — which is how you make an EWMA reproducible "
    "across cluster layouts without fixed-point tricks. Plan: one "
    "shuffle for the daily agg, the lag window reuses the SAME "
    "(event_type) partitioning, so no second exchange. At 100 TB the "
    "window key is the series id — thousands of independent series "
    "parallelize; a single global series would serialize (use the "
    "two-level prefix decomposition then).",
    tags=("temporal", "window", "extension"),
)
def t_ewma(spark, sf_dir):
    from pyspark.sql import Window

    daily = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(dsum("value").alias("v0"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type",
        "day",
        "v0",
        *[F.lag("v0", k).over(w).alias(f"v{k}") for k in range(1, 8)],
    )
    return lagged.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("v0").alias("daily_value"),
        F.expr(f"{_EWMA_NUM} / {_EWMA_DEN}").alias("ewma"),
    )


_INTERP_ORACLE = f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hh, {dsum_sql('value')} AS v
  FROM events GROUP BY 1, 2
),
span AS (SELECT event_type, min(hh) AS h0, max(hh) AS h1 FROM hourly GROUP BY 1),
grid AS (
  SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hh
  FROM span
),
joined AS (
  SELECT g.event_type, g.hh, h.v FROM grid g
  LEFT JOIN hourly h ON h.event_type = g.event_type AND h.hh = g.hh
),
bracketed AS (
  SELECT event_type, hh, v,
         last_value(v IGNORE NULLS) OVER wp AS prev_v,
         last_value(CASE WHEN v IS NOT NULL THEN hh END IGNORE NULLS) OVER wp AS prev_h,
         first_value(v IGNORE NULLS) OVER wf AS next_v,
         first_value(CASE WHEN v IS NOT NULL THEN hh END IGNORE NULLS) OVER wf AS next_h
  FROM joined
  WINDOW
    wp AS (PARTITION BY event_type ORDER BY hh
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    wf AS (PARTITION BY event_type ORDER BY hh
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type, strftime(hh, '%Y-%m-%d %H:%M:%S') AS hour,
       v AS observed,
       CASE WHEN v IS NOT NULL THEN v
            ELSE prev_v + (next_v - prev_v)
                 * ((epoch_us(hh) - epoch_us(prev_h))::DOUBLE
                    / (epoch_us(next_h) - epoch_us(prev_h))::DOUBLE)
       END AS value_interp,
       (v IS NULL) AS is_interpolated
FROM bracketed
"""


@register(
    "t_interp_linear",
    oracle=_INTERP_ORACLE,
    doc="Linear gap interpolation over the per-type hourly series: "
    "build the dense hour spine (sequence/explode <-> "
    "generate_series/unnest), left-join observations, bracket every "
    "gap with last/first IGNORE-NULLS windows over the SAME series "
    "partitioning (two window frames, one exchange), and fill "
    "prev + (next-prev) * dt-fraction. The fraction is an integer-"
    "microsecond ratio, so the fill is three IEEE ops in fixed order "
    "— bit-exact both engines. Interior spine hours always have both "
    "brackets (spine spans observed min..max). The ffill-only case "
    "is t_resample_ffill; this is the telemetry/sensor variant. At "
    "100 TB the spine explode is |series| x span/granularity rows — "
    "generated distributed, never on the driver.",
    tags=("temporal", "window", "extension"),
)
def t_interp_linear(spark, sf_dir):
    from pyspark.sql import Window

    hourly = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("hh"))
        .agg(dsum("value").alias("v"))
    )
    grid = (
        hourly.groupBy("event_type")
        .agg(F.min("hh").alias("h0"), F.max("hh").alias("h1"))
        .select(
            "event_type",
            F.explode(F.sequence("h0", "h1", F.expr("interval 1 hour"))).alias("hh"),
        )
    )
    j = grid.join(hourly, ["event_type", "hh"], "left")
    wp = (
        Window.partitionBy("event_type")
        .orderBy("hh")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("hh")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    known_h = F.when(F.col("v").isNotNull(), F.col("hh"))
    b = j.select(
        "event_type",
        "hh",
        "v",
        F.last("v", ignorenulls=True).over(wp).alias("prev_v"),
        F.last(known_h, ignorenulls=True).over(wp).alias("prev_h"),
        F.first("v", ignorenulls=True).over(wf).alias("next_v"),
        F.first(known_h, ignorenulls=True).over(wf).alias("next_h"),
    )
    frac = (
        F.unix_micros("hh") - F.unix_micros("prev_h")
    ).cast("double") / (F.unix_micros("next_h") - F.unix_micros("prev_h")).cast(
        "double"
    )
    return b.select(
        "event_type",
        F.date_format("hh", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.col("v").alias("observed"),
        F.when(F.col("v").isNotNull(), F.col("v"))
        .otherwise(F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * frac)
        .alias("value_interp"),
        F.col("v").isNull().alias("is_interpolated"),
    )


@register(
    "t_twap_per_user",
    # Time-weighted average of the user's value signal: the signal
    # holds each event's value until the next event (a step function),
    # so TWAP = sum(value_i * dt_i) / total_dt over the user's
    # observation span. Irregular sampling makes the plain mean wrong
    # whenever gaps correlate with level — the metric ops/finance
    # pipelines use instead. dt is integer seconds (epoch diffs);
    # value * dt is one exact double multiply per row; the weighted
    # sum goes through exact decimal; one final division.
    oracle="""
WITH seq AS (
  SELECT user_id, value, floor(epoch(ts))::BIGINT AS sec,
         lead(floor(epoch(ts))::BIGINT) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS next_sec
  FROM events
),
seg AS (
  SELECT user_id, value, (next_sec - sec)::BIGINT AS dt
  FROM seq WHERE next_sec IS NOT NULL AND next_sec > sec
)
SELECT user_id,
       count(*)::BIGINT AS n_segments,
       sum(dt)::BIGINT AS total_seconds,
       round(sum((value * dt::DOUBLE)::DECIMAL(30,10)), 4)::DOUBLE
         / sum(dt)::DOUBLE AS twap
FROM seg GROUP BY user_id
""",
    doc="Per-user time-weighted average (TWAP) of the event value "
    "signal: each value is weighted by how long it held (step-function "
    "semantics via a lead window on the user's timeline), so sparse "
    "quiet periods count by duration, not by sample count. One "
    "user-partitioned window + one aggregate, both sharing the "
    "user_id partitioning.",
    tags=("temporal", "window", "extension"),
)
def t_twap_per_user(spark, sf_dir):
    from pyspark.sql import Window

    from ..functions.exact import DEC, RSCALE

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "value",
        "ts",
        "event_id",
        F.col("ts").cast("long").alias("sec"),
    ).withColumn("next_sec", F.lead("sec").over(w))
    seg = seq.filter(
        F.col("next_sec").isNotNull() & (F.col("next_sec") > F.col("sec"))
    ).withColumn("dt", (F.col("next_sec") - F.col("sec")).cast("long"))
    return seg.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum("dt").alias("total_seconds"),
        (
            F.round(
                F.sum((F.col("value") * F.col("dt").cast("double")).cast(DEC)),
                RSCALE,
            ).cast("double")
            / F.sum("dt").cast("double")
        ).alias("twap"),
    )


@register(
    "t_rolling_corr",
    # 7-day rolling Pearson correlation between the click and purchase
    # daily value series: window sums over the tiny aligned daily
    # frame go through exact decimal, and the closed-form correlation
    # (n*sxy - sx*sy over the product of root variances) is computed
    # in the identical operation order in both engines. Emitted only
    # for full 7-day windows.
    oracle=f"""
WITH daily AS (
  SELECT strftime(ts::DATE, '%Y-%m-%d') AS day,
         {dsum_sql("CASE WHEN event_type = 'click' THEN value ELSE 0.0 END")} AS x,
         {dsum_sql("CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END")} AS y
  FROM events GROUP BY 1
),
w AS (
  -- moments on the DOWN-SCALED series (x * 1e-2): Pearson is scale-
  -- invariant, and the unscaled squares (~1.1e11 per day at sf1)
  -- summed over 7-day windows to ~7.7e11 — brushing the 9e11
  -- dsum->double envelope, where the decimal->double cast diverges
  -- per engine (the r12 sf1 gate caught it). Scaled, sxx ~ 7.6e7 at
  -- sf1 and the envelope holds to ~sf100.
  SELECT day,
         row_number() OVER (ORDER BY day) AS rn,
         round(sum((x * 1e-2)::DECIMAL(30,10)) OVER win, 4)::DOUBLE AS sx,
         round(sum((y * 1e-2)::DECIMAL(30,10)) OVER win, 4)::DOUBLE AS sy,
         round(sum(((x * 1e-2) * (y * 1e-2))::DECIMAL(30,10)) OVER win, 4)::DOUBLE AS sxy,
         round(sum(((x * 1e-2) * (x * 1e-2))::DECIMAL(30,10)) OVER win, 4)::DOUBLE AS sxx,
         round(sum(((y * 1e-2) * (y * 1e-2))::DECIMAL(30,10)) OVER win, 4)::DOUBLE AS syy
  FROM daily
  WINDOW win AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT day,
       CASE WHEN 7.0::DOUBLE * sxx - sx * sx > 0.0::DOUBLE
             AND 7.0::DOUBLE * syy - sy * sy > 0.0::DOUBLE
            THEN (7.0::DOUBLE * sxy - sx * sy)
                 / (sqrt(7.0::DOUBLE * sxx - sx * sx)
                    * sqrt(7.0::DOUBLE * syy - sy * sy))
            ELSE NULL END AS rolling_corr_7d
FROM w WHERE rn >= 7
""",
    doc="7-day rolling Pearson correlation between the click and "
    "purchase daily revenue series — the co-movement monitor behind "
    "channel-interaction dashboards. The fact aggregates once to the "
    "aligned daily frame; all five rolling moments come from decimal "
    "window sums over that tiny series, and the closed-form "
    "correlation is bit-identical across engines.",
    tags=("temporal", "window", "stats", "extension"),
)
def t_rolling_corr(spark, sf_dir):
    from pyspark.sql import Window

    from ..functions.exact import DEC, dsum

    ev = load(spark, sf_dir, "events")
    x = F.when(F.col("event_type") == "click", F.col("value")).otherwise(F.lit(0.0))
    y = F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(
        F.lit(0.0)
    )
    daily = ev.groupBy(
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day")
    ).agg(dsum(x).alias("x"), dsum(y).alias("y"))
    win = Window.orderBy("day").rowsBetween(-6, Window.currentRow)

    def rs(col):
        return F.round(F.sum(col.cast(DEC)).over(win), 4).cast("double")

    # Moments on the DOWN-SCALED daily series (x * 1e-2): Pearson is
    # scale-invariant, and the unscaled 7-day square sums brushed the
    # 9e11 dsum->double envelope at sf1 (r12 sf1-gate catch); scaled,
    # the envelope holds to ~sf100. Mirrors the oracle token-for-token.
    xs = F.col("x") * F.lit(1.0e-2)
    ys = F.col("y") * F.lit(1.0e-2)
    w = daily.select(
        "day",
        F.row_number().over(Window.orderBy("day")).alias("rn"),
        rs(xs).alias("sx"),
        rs(ys).alias("sy"),
        rs(xs * ys).alias("sxy"),
        rs(xs * xs).alias("sxx"),
        rs(ys * ys).alias("syy"),
    )
    seven = F.lit(7.0)
    # A (near-)constant window can round 7*sxx - sx*sx to a tiny
    # negative: DuckDB raises on sqrt(<0) while Spark yields NaN.
    # Guard the variance terms identically in both engines and emit
    # NULL when either is non-positive (correlation is undefined).
    vx = seven * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = seven * F.col("syy") - F.col("sy") * F.col("sy")
    corr = F.when(
        (vx > F.lit(0.0)) & (vy > F.lit(0.0)),
        (seven * F.col("sxy") - F.col("sx") * F.col("sy"))
        / (F.sqrt(vx) * F.sqrt(vy)),
    )
    return w.filter(F.col("rn") >= 7).select("day", corr.alias("rolling_corr_7d"))


@register(
    "t_seasonal_decompose",
    # Classical additive seasonal decomposition of the daily revenue
    # series: trend = centered 7-day exact-decimal moving mean (full
    # windows only), seasonal = per-ISO-weekday exact-decimal mean of
    # the detrended series, residual = value - trend - seasonal.
    # Every mean is round(sum(DECIMAL))/count and every subtraction is
    # the same IEEE op on identical doubles, so the whole
    # decomposition is bit-identical across engines.
    oracle=f"""
WITH daily AS (
  SELECT ts::DATE AS day, {dsum_sql('value')} AS v
  FROM events GROUP BY 1
),
tr AS (
  SELECT day, v,
         {dsum_over_sql('v', 'ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING')}
           / 7 AS trend,
         count(*) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
           AS n_win
  FROM daily
),
det AS (
  SELECT day, v, trend, v - trend AS detrended, isodow(day)::INT AS dow
  FROM tr WHERE n_win = 7
),
seas AS (
  SELECT dow, {davg_sql('detrended')} AS seasonal FROM det GROUP BY dow
)
SELECT strftime(d.day, '%Y-%m-%d') AS day, d.v AS value, d.trend,
       s.seasonal, d.v - d.trend - s.seasonal AS residual
FROM det d JOIN seas s USING (dow)
""",
    doc="Additive seasonal decomposition (trend / weekly seasonal / "
    "residual) of daily revenue: centered 7-day decimal moving mean, "
    "per-ISO-weekday decimal mean of the detrended series, residual "
    "by subtraction — the forecasting-prep staple. The fact table "
    "aggregates once to the daily grain; every window after that runs "
    "on the tiny daily series (the t_rolling_corr pattern), and the "
    "7-row seasonal table broadcasts back.",
    tags=("temporal", "window", "stats", "extension"),
)
def t_seasonal_decompose(spark, sf_dir):
    from pyspark.sql import Window

    from ..functions.exact import davg, dsum, dsum_over

    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(dsum("value").alias("v"))
    win = Window.orderBy("day").rowsBetween(-3, 3)
    tr = daily.select(
        "day",
        "v",
        (dsum_over(F.col("v"), win) / F.lit(7)).alias("trend"),
        F.count(F.lit(1)).over(win).alias("n_win"),
    )
    det = tr.filter(F.col("n_win") == 7).select(
        "day",
        "v",
        "trend",
        (F.col("v") - F.col("trend")).alias("detrended"),
        ((F.dayofweek("day") + 5) % 7 + 1).cast("int").alias("dow"),
    )
    seas = det.groupBy("dow").agg(davg("detrended").alias("seasonal"))
    return (
        det.join(F.broadcast(seas), "dow")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("v").alias("value"),
            "trend",
            "seasonal",
            (F.col("v") - F.col("trend") - F.col("seasonal")).alias("residual"),
        )
    )


@register(
    "t_forecast_eval",
    # Forecast backtest on the last-7-day holdout of the daily revenue
    # series: the NAIVE forecast repeats the final training day, the
    # SEASONAL-NAIVE forecast repeats the value 7 days earlier (same
    # weekday). MAE and RMSE per method through the exact-decimal mean
    # (abs/square of identical doubles, one sqrt at the end) — the
    # baseline pair every forecasting model must beat, and the
    # evaluation harness shape for any of them.
    oracle=f"""
WITH daily AS (
  SELECT ts::DATE AS day, {dsum_sql('value')} AS v
  FROM events GROUP BY 1
),
cut AS (SELECT max(day) - INTERVAL 6 DAY AS c FROM daily),
test AS (SELECT day, v FROM daily, cut WHERE day >= c),
last_train AS (
  SELECT v AS naive_fc FROM daily, cut WHERE day = c - INTERVAL 1 DAY
),
joined AS (
  SELECT t.day, t.v,
         (SELECT naive_fc FROM last_train) AS f_naive,
         s.v AS f_seasonal
  FROM test t JOIN daily s ON s.day = t.day - INTERVAL 7 DAY
),
errs AS (
  SELECT 'naive' AS method, abs(v - f_naive) AS ae,
         (v - f_naive) * (v - f_naive) AS se FROM joined
  UNION ALL
  SELECT 'seasonal_naive', abs(v - f_seasonal),
         (v - f_seasonal) * (v - f_seasonal) FROM joined
)
SELECT method, count(*)::BIGINT AS n_days,
       {davg_sql('ae')} AS mae,
       sqrt({davg_sql('se')}) AS rmse
FROM errs GROUP BY method
""",
    doc="Forecast backtest (naive vs seasonal-naive) on the last-7-day "
    "holdout: point forecasts by date arithmetic (no model state), "
    "errors through the exact-decimal mean, one sqrt for RMSE — "
    "engine-identical. The shape is the evaluation harness for any "
    "real forecaster: everything runs on the tiny daily grain after "
    "one fact-table aggregate.",
    tags=("temporal", "stats", "extension"),
)
def t_forecast_eval(spark, sf_dir):
    from ..functions.exact import davg, dsum

    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        dsum("value").alias("v")
    ).transform(lineage_cut_lazy)  # consumed 4x below
    cut = daily.agg(F.date_sub(F.max("day"), 6).alias("c"))
    test = daily.crossJoin(F.broadcast(cut)).filter(F.col("day") >= F.col("c"))
    last_train = (
        daily.crossJoin(F.broadcast(cut))
        .filter(F.col("day") == F.date_sub(F.col("c"), 1))
        .select(F.col("v").alias("f_naive"))
    )
    seasonal = daily.select(
        F.date_add("day", 7).alias("day"), F.col("v").alias("f_seasonal")
    )
    joined = (
        test.join(seasonal, "day")
        .crossJoin(F.broadcast(last_train))
        .select("day", "v", "f_naive", "f_seasonal")
    )
    naive = joined.select(
        F.lit("naive").alias("method"),
        F.abs(F.col("v") - F.col("f_naive")).alias("ae"),
        ((F.col("v") - F.col("f_naive")) * (F.col("v") - F.col("f_naive"))).alias(
            "se"
        ),
    )
    seas = joined.select(
        F.lit("seasonal_naive").alias("method"),
        F.abs(F.col("v") - F.col("f_seasonal")).alias("ae"),
        (
            (F.col("v") - F.col("f_seasonal"))
            * (F.col("v") - F.col("f_seasonal"))
        ).alias("se"),
    )
    return (
        naive.unionByName(seas)
        .groupBy("method")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            davg("ae").alias("mae"),
            F.sqrt(davg("se")).alias("rmse"),
        )
    )


LTTB_BUCKETS = 20  # output points per user (excl. the fixed endpoints)


@register(
    "t_downsample_lttb",
    # Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013,
    # public — the standard dashboard decimation that keeps visual
    # extremes where uniform sampling flattens them), in its
    # bucket-anchored PARALLEL variant: the canonical algorithm ranks
    # each candidate by triangle area against the PREVIOUSLY SELECTED
    # point (a sequential chain); anchoring on the neighbor buckets'
    # centroids instead makes every bucket's argmax independent — a
    # per-(user, bucket) window — at a small, documented fidelity
    # difference. Geometry is one fixed double expression (identical
    # bits both engines); the argmax tie chain is (area DESC,
    # event_id). Output: the selected points' census per user with
    # exact-decimal value sums.
    oracle=f"""
WITH pts AS (
  SELECT user_id, event_id, floor(epoch(ts))::BIGINT AS x, value AS y,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events
),
bucketed AS (
  SELECT *, least(((rn - 1) * {LTTB_BUCKETS}) // n, {LTTB_BUCKETS} - 1) AS b
  FROM pts
),
centroids AS (
  SELECT user_id, b, avg(x::DOUBLE) AS cx, avg(y::DOUBLE) AS cy
  FROM bucketed GROUP BY 1, 2
),
scored AS (
  SELECT p.user_id, p.event_id, p.b, p.y,
         abs((prev.cx - nxt.cx) * (p.y - prev.cy)
             - (prev.cx - p.x) * (nxt.cy - prev.cy)) AS area2
  FROM bucketed p
  JOIN centroids prev ON prev.user_id = p.user_id AND prev.b = p.b - 1
  JOIN centroids nxt  ON nxt.user_id = p.user_id AND nxt.b = p.b + 1
),
sel AS (
  SELECT user_id, event_id, y FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id, b
                                 ORDER BY area2 DESC, event_id) AS rk
    FROM scored
  ) WHERE rk = 1
),
ends AS (
  SELECT user_id, event_id, y FROM bucketed WHERE rn = 1 OR rn = n
),
keep AS (SELECT * FROM sel UNION SELECT * FROM ends)
SELECT k.user_id,
       max(p.n)::BIGINT AS n_points_in,
       count(*)::BIGINT AS n_points_out,
       round(sum(k.y::DECIMAL(30,10)), 4)::DOUBLE AS kept_value_sum
FROM keep k JOIN pts p ON p.user_id = k.user_id AND p.event_id = k.event_id
GROUP BY k.user_id
""",
    doc="LTTB time-series downsampling (bucket-anchored parallel "
    "variant): per-user series cut into equal-rank buckets, each "
    "bucket keeping its max-triangle-area point against the neighbor "
    "centroids, endpoints always kept — the dashboard decimation "
    "that preserves visual extremes. Per-(user,bucket) windows only; "
    "no sequential chain, so it parallelizes at any scale.",
    tags=("temporal", "extension"),
)
def t_downsample_lttb(spark, sf_dir):
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    w_u = W.partitionBy("user_id")
    pts = ev.select(
        "user_id",
        "event_id",
        F.floor(F.unix_timestamp("ts")).cast("long").alias("x"),
        F.col("value").alias("y"),
        F.row_number().over(w_u.orderBy("ts", "event_id")).alias("rn"),
        F.count(F.lit(1)).over(w_u).alias("n"),
    ).transform(lineage_cut_lazy)  # bucketing + endpoint pick + final join
    bucketed = pts.withColumn(
        # integer `div`, not double `/`+cast: exact floor at any size
        "b",
        F.least(
            F.expr(f"((rn - 1) * {LTTB_BUCKETS}) div n"),
            F.lit(LTTB_BUCKETS - 1).cast("long"),
        ),
    )
    centroids = bucketed.groupBy("user_id", "b").agg(
        F.avg(F.col("x").cast("double")).alias("cx"),
        F.avg(F.col("y").cast("double")).alias("cy"),
    )
    prev = centroids.select(
        F.col("user_id").alias("p_uid"),
        (F.col("b") + 1).alias("p_b"),
        F.col("cx").alias("pcx"),
        F.col("cy").alias("pcy"),
    )
    nxt = centroids.select(
        F.col("user_id").alias("n_uid"),
        (F.col("b") - 1).alias("n_b"),
        F.col("cx").alias("ncx"),
        F.col("cy").alias("ncy"),
    )
    scored = (
        bucketed.join(
            prev, (F.col("p_uid") == F.col("user_id")) & (F.col("p_b") == F.col("b"))
        )
        .join(
            nxt, (F.col("n_uid") == F.col("user_id")) & (F.col("n_b") == F.col("b"))
        )
        .withColumn(
            "area2",
            F.abs(
                (F.col("pcx") - F.col("ncx")) * (F.col("y") - F.col("pcy"))
                - (F.col("pcx") - F.col("x")) * (F.col("ncy") - F.col("pcy"))
            ),
        )
    )
    sel = (
        scored.withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("user_id", "b").orderBy(
                    F.col("area2").desc(), "event_id"
                )
            ),
        )
        .filter(F.col("rk") == 1)
        .select("user_id", "event_id", "y")
    )
    ends = bucketed.filter(
        (F.col("rn") == 1) | (F.col("rn") == F.col("n"))
    ).select("user_id", "event_id", "y")
    keep = sel.unionByName(ends).distinct()
    joined = keep.join(
        pts.select(F.col("user_id").alias("j_uid"), F.col("event_id").alias("j_eid"), "n"),
        (F.col("j_uid") == F.col("user_id")) & (F.col("j_eid") == F.col("event_id")),
    )
    return joined.groupBy("user_id").agg(
        F.max("n").cast("long").alias("n_points_in"),
        F.count(F.lit(1)).cast("long").alias("n_points_out"),
        dsum("y").alias("kept_value_sum"),
    )


@register(
    "t_asof_join_cogrouped",
    # The cogroup().applyInPandas formulation of the as-of join,
    # promoted from pytest-only cross-validation to a registered,
    # oracle-gated query: one shuffle of each side on the key, then a
    # pandas.merge_asof per key-group Arrow batch. Same backward-
    # inclusive semantics as t_asof_join (the union+window JVM plan
    # stays the production path; this face is the template for as-of
    # logic that genuinely needs pandas, e.g. irregular-calendar
    # tolerance windows) — and the SAME DuckDB ASOF JOIN oracle, so
    # the two formulations are pinned equal through the driver gate,
    # not just a unit test.
    oracle="""
SELECT a.event_id,
       a.user_id,
       strftime(a.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
       b.event_id AS purchase_event_id,
       b.value    AS purchase_value
FROM (SELECT * FROM events WHERE event_type = 'click') a
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
  ON a.user_id = b.user_id AND a.ts >= b.ts
""",
    doc="As-of join in its co-grouped-map form (cogroup + merge_asof "
    "per Arrow batch): the Python-boundary formulation of t_asof_join "
    "under the same DuckDB ASOF JOIN oracle — proving the cogroup API "
    "face against an independent engine, not just against the twin "
    "plan.",
    tags=("temporal", "join", "extension"),
)
def t_asof_join_cogrouped(spark, sf_dir):
    from ..operators.temporal import asof_join_cogrouped

    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_event_id"), "user_id", "ts", "value"
    )
    joined = asof_join_cogrouped(
        clicks,
        purchases,
        on=["user_id"],
        ts_col="ts",
        payload_cols=["p_event_id", "value"],
        suffix="",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.col("p_event_id").alias("purchase_event_id"),
        F.col("value").alias("purchase_value"),
    )


ACF_MAX_LAG = 7


def _acf_arms_sql() -> str:
    """One UNION ALL arm per lag (DuckDB's lag() needs a constant
    offset, so the lag fan-out is generated, not parameterized)."""
    arms = []
    # v * 1e-2: Pearson is scale-invariant, and the down-scaled series
    # keeps the squared moments inside the dsum->double envelope (see
    # the sxx/syy note in the t_autocorrelation oracle).
    for k in range(1, ACF_MAX_LAG + 1):
        arms.append(f"""
SELECT event_type, {k} AS lag,
       v * 1e-2 AS x,
       lag(v * 1e-2, {k}) OVER (PARTITION BY event_type ORDER BY day) AS y
FROM daily""")
    return " UNION ALL ".join(arms)


@register(
    "t_autocorrelation",
    # Autocorrelation function of the per-type daily value series at
    # lags 1..7 (the seasonality/persistence fingerprint a forecaster
    # reads before model choice; a weekly cycle shows as a lag-7
    # bump). Estimator: Pearson correlation of (x_t, x_{t-k}) over the
    # overlapping pairs — all five moments are exact-decimal sums of
    # doubles, the correlation is one fixed closed-form tree (the
    # a_corr_matrix recipe on the time axis). The lag window is
    # PARTITIONED by series id; the lag fan-out is 7 window passes
    # over an already-aggregated daily table (~30 rows per type), not
    # the fact table. Variance guard: a constant series yields NULL r
    # (sqrt of 0 denominator) identically in both engines via a CASE.
    oracle=f"""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         {dsum_sql('value')} AS v
  FROM events GROUP BY 1, 2
),
lagged AS ({_acf_arms_sql()}),
m AS (
  SELECT event_type, lag,
         count(*)::BIGINT AS n,
         {dsum_sql('x')} AS sx, {dsum_sql('y')} AS sy,
         {dsum_sql('x * y')} AS sxy,
         -- sxx/syy square per-day dsum totals (~3e5 at sf1), growing
         -- QUADRATICALLY with sf — the UNSCALED squares summed to
         -- ~3e12 at sf1, past the 9e11 dsum->double envelope
         -- (functions/exact.py); the r12 sf1 gate caught the last-bit
         -- acf divergence. Fix: the lagged arms feed x = v * 1e-2
         -- (Pearson is scale-invariant), so sxx ~ 3e8*sf^2 now holds
         -- to ~sf53 — sxx/syy stay the first breach.
         {dsum_sql('x * x')} AS sxx, {dsum_sql('y * y')} AS syy
  FROM lagged WHERE y IS NOT NULL
  GROUP BY 1, 2
)
SELECT event_type, lag, n,
       CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
            THEN (n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
            ELSE NULL END AS acf
FROM m ORDER BY event_type, lag
""",
    doc="Autocorrelation of the per-type daily value series at lags "
    "1..7: Pearson over overlapping (x_t, x_{t-k}) pairs from "
    "exact-decimal moments, partitioned lag windows over the daily "
    "grain, closed-form doubles — the pre-forecasting seasonality "
    "fingerprint (weekly cycles surface at lag 7).",
    tags=("temporal", "stats", "extension"),
)
def t_autocorrelation(spark, sf_dir):
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(dsum("value").alias("v"))
        # vs = v * 1e-2: Pearson is scale-invariant and the down-scale
        # keeps sxx/syy inside the dsum envelope to ~sf53 (the
        # unscaled squares breached it at sf1 — r12 sf1-gate catch;
        # derivation in the oracle text and the value-parity twin).
        .withColumn("vs", F.col("v") * F.lit(1.0e-2))
        .transform(lineage_cut_lazy)  # 7 lag passes read it
    )
    w = W.partitionBy("event_type").orderBy("day")
    arms = [
        daily.select(
            "event_type",
            F.lit(k).alias("lag"),
            F.col("vs").alias("x"),
            F.lag("vs", k).over(w).alias("y"),
        )
        for k in range(1, ACF_MAX_LAG + 1)
    ]
    lagged = arms[0]
    for a in arms[1:]:
        lagged = lagged.unionByName(a)
    m = (
        lagged.filter(F.col("y").isNotNull())
        .groupBy("event_type", "lag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("x").alias("sx"),
            dsum("y").alias("sy"),
            dsum(F.col("x") * F.col("y")).alias("sxy"),
            dsum(F.col("x") * F.col("x")).alias("sxx"),
            dsum(F.col("y") * F.col("y")).alias("syy"),
        )
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return m.select(
        "event_type",
        "lag",
        "n",
        F.when(
            (vx > 0) & (vy > 0),
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.sqrt(vx) * F.sqrt(vy)),
        ).alias("acf"),
    ).orderBy("event_type", "lag")
