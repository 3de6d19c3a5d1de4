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
