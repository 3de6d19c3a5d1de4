"""Accuracy bounds for the sketch-based aggregates (rows-only at the
driver gate; verified against exact values here)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ast_data_pipeline_spark.registry import load_all
from ast_data_pipeline_spark.sources.catalog import load


def test_approx_profile_bounds(spark, sf_dir):
    row = load_all()["a4_approx_profile"].fn(spark, sf_dir).collect()[0]
    li = load(spark, sf_dir, "lineitem")
    exact = li.agg(
        F.countDistinct("l_partkey").alias("p"),
        F.countDistinct("l_orderkey").alias("o"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("m"),
    ).collect()[0]
    # HLL++ with rsd=0.02: allow 5x headroom on the nominal error
    assert abs(row.approx_parts - exact.p) <= max(3, 0.1 * exact.p)
    assert abs(row.approx_orders - exact.o) <= max(3, 0.1 * exact.o)
    # percentile_approx with accuracy 10000 is near-exact at this scale
    assert abs(row.median_price_approx - exact.m) <= 0.05 * exact.m
    assert row.qty_p25 <= row.qty_p75
