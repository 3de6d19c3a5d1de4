"""sources/parallel.scan_floor — the r14 input-layout remediation.

Pins the two properties the optimization relies on:
 1. the gate reads real footer metadata (single-row-group testdata
    fires; a healthy layout — simulated via the cache — does not);
 2. the repartition is a pure reshuffle: same rows, and the query
    result through the floor is identical (a8's oracle gate covers the
    aggregate; here we pin row-level identity on the raw table).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ast_data_pipeline_spark.sources import parallel
from ast_data_pipeline_spark.sources.catalog import load, table_path

SF = "/root/testdata/sf0.001"


def test_floor_fires_on_single_row_group_layout(spark):
    df = load(spark, SF, "lineitem")
    out = parallel.scan_floor(spark, SF, "lineitem", df)
    par = spark.sparkContext.defaultParallelism
    assert parallel._row_groups(table_path(SF, "lineitem")) * 2 < par
    # plan gained a RepartitionByExpression on the deterministic key
    assert "xxhash64" in out._jdf.queryExecution().logical().toString()


def test_floor_noop_on_healthy_layout(spark):
    path = table_path(SF, "orders")
    parallel._RG_CACHE[path] = 10_000  # simulate ~128 MB row groups
    try:
        df = load(spark, SF, "orders")
        out = parallel.scan_floor(spark, SF, "orders", df)
        assert out is df
    finally:
        del parallel._RG_CACHE[path]


def test_floor_preserves_rows_exactly(spark):
    df = load(spark, SF, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    out = parallel.scan_floor(
        spark, SF, "lineitem", load(spark, SF, "lineitem")
    ).select("l_orderkey", "l_linenumber", "l_extendedprice")
    assert out.count() == df.count()
    assert out.exceptAll(df).count() == 0
    assert df.exceptAll(out).count() == 0


def test_dedup_floor_shares_the_distinct_exchange(spark):
    """dedup_floor's whole point: the pre-partitioning on the dedup
    columns must SATISFY the downstream distinct's required
    distribution, so the plan has exactly one hash exchange (the
    repartition), not two — and the partial aggregate runs after it."""
    cols = ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"]
    df = load(spark, SF, "lineitem").select(*cols)
    out = parallel.dedup_floor(spark, SF, "lineitem", df, cols).dropDuplicates()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan[:2000]


def test_dedup_floor_noop_on_healthy_layout(spark):
    path = table_path(SF, "orders")
    parallel._RG_CACHE[path] = 10_000
    try:
        df = load(spark, SF, "orders").select("o_orderkey", "o_custkey")
        out = parallel.dedup_floor(
            spark, SF, "orders", df, ["o_orderkey"]
        )
        assert out is df
    finally:
        del parallel._RG_CACHE[path]


def test_dedup_floor_preserves_distinct_rows(spark):
    cols = ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"]
    base = load(spark, SF, "lineitem").select(*cols).dropDuplicates()
    floored = parallel.dedup_floor(
        spark, SF, "lineitem", load(spark, SF, "lineitem").select(*cols), cols
    ).dropDuplicates()
    assert floored.count() == base.count()
    assert floored.exceptAll(base).count() == 0
