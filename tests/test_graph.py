"""PageRank fixed-point properties beyond the oracle parity test."""

from __future__ import annotations

from pyspark.sql import functions as F

from ast_data_pipeline_spark.queries.graph import _FP, x_pagerank


def test_pagerank_layout_independent(spark, sf_dir):
    """The core fixed-point claim: ranks are bit-identical under a
    different shuffle layout (float PageRank would differ in low bits
    by partial-aggregation order)."""
    base = {r["node"]: r["rank"] for r in x_pagerank(spark, sf_dir).collect()}
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        relaid = {r["node"]: r["rank"] for r in x_pagerank(spark, sf_dir).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert base == relaid


def test_pagerank_sane(spark, sf_dir):
    df = x_pagerank(spark, sf_dir).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("rank").alias("lo"),
        F.max("rank").alias("hi"),
        F.avg("rank").alias("mean"),
    )
    row = df.collect()[0]
    assert row["n"] > 0
    # every node keeps at least the teleport mass; integer-division
    # truncation only ever loses mass, so the mean stays <= 1.0
    assert row["lo"] >= _FP * 15 // 100
    assert row["mean"] <= _FP
