"""Bucketed materialization of the domain views: the 100 TB
amortization path (SCALING.md "Materialization of shared derived
views"). Checks both halves: results identical to the raw views, and
tile_key joins/aggregations over the materialized tables plan without
a shuffle exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ast_data_pipeline_spark.sources import domain_views as DV
from ast_data_pipeline_spark.sources.materialize import (
    drop_materialized,
    materialize_domain_views,
    read_materialized,
)


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def mat(spark, sf_dir):
    tables = materialize_domain_views(spark, sf_dir, buckets=4, prefix="tmat_")
    yield tables
    drop_materialized(spark, prefix="tmat_")


def test_materialized_matches_raw(spark, sf_dir, mat):
    for view in ("annotations", "gann"):
        raw = DV.BUILDERS[view](spark, sf_dir)
        got = read_materialized(spark, view, prefix="tmat_")
        assert got.count() == raw.count()
        key_cols = ["annot_id"]
        assert (
            got.select(key_cols).exceptAll(raw.select(key_cols)).count() == 0
        )


def test_bucketed_tile_join_and_agg_skip_shuffle(spark, mat):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ann = read_materialized(spark, "annotations", prefix="tmat_")
        t = read_materialized(spark, "tiles", prefix="tmat_")
        j = ann.join(t.select("tile_key", "tile_width"), "tile_key")
        plan = _plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan[:1500]

        agg = ann.groupBy("tile_key").agg(F.count(F.lit(1)).alias("n"))
        plan = _plan(agg)
        assert "Exchange hashpartitioning" not in plan, plan[:1500]
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_flagship_runs_off_materialized_warehouse(spark, sf_dir, mat):
    # the 100 TB input shape: the flagship reads the bucketed tables
    # instead of re-deriving the views, and produces the identical
    # inventory
    from ast_data_pipeline_spark.plans.tank_inventory import tank_inventory
    from ast_data_pipeline_spark.sources.domain_views import materialized_views

    raw = tank_inventory(spark, sf_dir).select(
        "tank_id", "object_class", "county", "diameter"
    ).toPandas().sort_values("tank_id").reset_index(drop=True)
    with materialized_views("tmat_"):
        mat_out = tank_inventory(spark, sf_dir).select(
            "tank_id", "object_class", "county", "diameter"
        ).toPandas().sort_values("tank_id").reset_index(drop=True)
    assert len(raw) > 0
    assert raw.equals(mat_out)
