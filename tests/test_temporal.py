"""Operator-level tests for the temporal joins: the as-of join must
equal a brute-force inequality-join argmax, and the binned range join
must equal the plain theta join it replaces — plus plan assertions
that the scale properties (single shuffle / no BNLJ) actually hold."""

from __future__ import annotations

from pyspark.sql import functions as F

from ast_data_pipeline_spark.operators.temporal import asof_join, range_join_binned
from ast_data_pipeline_spark.sources.catalog import load


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_asof_equals_bruteforce(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_event_id"), "user_id", "ts", "value"
    )
    got = asof_join(clicks, purch, on=["user_id"], ts_col="ts",
                    payload_cols=["p_event_id", "value"], suffix="")

    # brute force: inequality join + max_by on right ts
    c, p = clicks.alias("c"), purch.alias("p")
    brute = (
        c.join(p, (F.col("c.user_id") == F.col("p.user_id")) & (F.col("p.ts") <= F.col("c.ts")), "left")
        .groupBy("c.event_id", "c.user_id", "c.ts")
        .agg(
            F.max_by("p.p_event_id", "p.ts").alias("p_event_id"),
            F.max_by("p.value", "p.ts").alias("value"),
        )
    )
    assert _rows(got.select("event_id", "p_event_id", "value")) == _rows(
        brute.select("event_id", "p_event_id", "value")
    )


def test_asof_single_shuffle_no_join(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_event_id"), "user_id", "ts", "value"
    )
    plan = _plan(
        asof_join(clicks, purch, on=["user_id"], ts_col="ts",
                  payload_cols=["p_event_id", "value"], suffix="")
    )
    # union+window: no join operator at all, exactly one exchange
    assert "Join" not in plan, plan[:1500]
    assert plan.count("Exchange hashpartitioning") == 1, plan[:1500]


def test_range_join_binned_equals_theta(spark, sf_dir):
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
    binned = range_join_binned(ev, iv, "ts", "start_ts", "end_ts", bucket="1 hour")
    theta = ev.join(
        iv, (F.col("ts") >= F.col("start_ts")) & (F.col("ts") < F.col("end_ts"))
    )
    key = lambda df: _rows(df.select("event_id", "day"))
    assert key(binned) == key(theta)
    # and the binned plan is a hash join, not a nested-loop join
    plan = _plan(binned)
    assert "BroadcastNestedLoopJoin" not in plan, plan[:1500]


def test_asof_cogrouped_equals_window(spark, sf_dir):
    from ast_data_pipeline_spark.operators.temporal import asof_join_cogrouped

    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_event_id"), "user_id", "ts", "value"
    )
    kwargs = dict(on=["user_id"], ts_col="ts", payload_cols=["p_event_id", "value"], suffix="")
    a = asof_join(clicks, purch, **kwargs).select("event_id", "p_event_id", "value")
    b = asof_join_cogrouped(clicks, purch, **kwargs).select("event_id", "p_event_id", "value")
    assert _rows(a) == _rows(b)
