"""Sink round-trip tests (SURVEY §2.1 K1/K2/K4/K5)."""

from __future__ import annotations

import json

import pytest

from ast_data_pipeline_spark.plans.tank_inventory import tank_inventory
from ast_data_pipeline_spark.sources.sinks import (
    shapefile_compat_columns,
    write_csv_report,
    write_inventory_json,
    write_json_list,
    write_queue_snapshot,
)


def test_k4_inventory_json_roundtrip(spark, sf_dir, tmp_path):
    inv = tank_inventory(spark, sf_dir).limit(200)
    full, compat = str(tmp_path / "inv"), str(tmp_path / "inv_shp")
    write_inventory_json(inv, full, shp_compat_path=compat)
    back = spark.read.json(full)
    assert back.count() == inv.count()
    assert "geometry_wkt" in back.columns and "image_names" in back.columns
    assert back.selectExpr("max(geometry_wkt like 'POLYGON ((%')").collect()[0][0]

    shp = spark.read.json(compat)
    # DBF 10-char truncation; list column dropped (K4 legacy artifact)
    assert all(len(c) <= 10 for c in shp.columns)
    assert "image_names" not in shp.columns
    assert "object_cla" in shp.columns  # object_class -> object_cla


def test_shapefile_compat_dedup(spark):
    df = spark.createDataFrame(
        [(1, 2, 3)], "object_class_a long, object_class_b long, ok long"
    )
    out = shapefile_compat_columns(df)
    assert out.columns == ["object_cla", "object_cl1", "ok"]


def test_k1_csv_report_roundtrip(spark, sf_dir, tmp_path):
    from ast_data_pipeline_spark.registry import load_all

    rep = load_all()["a3_crosstab_margins"].fn(spark, sf_dir)
    path = str(tmp_path / "report")
    write_csv_report(rep, path)
    back = spark.read.option("header", True).csv(path)
    assert back.count() == rep.count()
    assert set(back.columns) == set(rep.columns)


def test_k2_queue_snapshot_overwrite(spark, sf_dir, tmp_path):
    from ast_data_pipeline_spark.plans.workqueue import allocate_round
    from ast_data_pipeline_spark.sources.catalog import load

    q = load(spark, sf_dir, "orders").select("o_orderkey")
    path = str(tmp_path / "queue")
    alloc, rest = allocate_round(q, 100, "o_orderkey")
    write_queue_snapshot(rest, path)
    n1 = spark.read.parquet(path).count()
    alloc2, rest2 = allocate_round(spark.read.parquet(path), 100, "o_orderkey")
    write_queue_snapshot(rest2, str(tmp_path / "queue2"))
    n2 = spark.read.parquet(str(tmp_path / "queue2")).count()
    assert n1 - n2 == 100


def test_k5_json_list(tmp_path):
    p = str(tmp_path / "list.json")
    write_json_list(["a", "b"], p)
    assert json.load(open(p)) == ["a", "b"]


def test_k1_csv_report_row_bound(spark, tmp_path, monkeypatch):
    import ast_data_pipeline_spark.sources.sinks as sinks

    monkeypatch.setattr(sinks, "MAX_REPORT_ROWS", 10)
    big = spark.range(100).selectExpr("id", "id * 2 AS v")
    with pytest.raises(ValueError, match="MAX_REPORT_ROWS"):
        sinks.write_csv_report(big, str(tmp_path / "big_report"))


def test_k4_export_inventory_trio(spark, sf_dir, tmp_path):
    import os

    from ast_data_pipeline_spark.sources.sinks import export_inventory

    inv = tank_inventory(spark, sf_dir).select(
        "tank_id", "object_class", "image_names", "geometry_wkt",
        "diameter", "county",
    )
    counts = export_inventory(inv, str(tmp_path), name="tla")
    n = inv.count()
    assert counts == {"json": n, "geojson": n, "shp": n}
    # the reference writes the FeatureCollection under BOTH names
    fc = json.load(open(tmp_path / "tla.json"))
    assert fc == json.load(open(tmp_path / "tla.geojson"))
    assert fc["type"] == "FeatureCollection" and len(fc["features"]) == n
    f0 = fc["features"][0]
    assert f0["geometry"]["type"] == "Polygon"
    ring = f0["geometry"]["coordinates"][0]
    assert ring[0] == ring[-1] and len(ring) >= 4
    # GeoJSON keeps list columns; the shapefile flavor drops them
    assert isinstance(f0["properties"]["image_names"], list)
    assert "geometry_wkt" not in f0["properties"]
    for ext in (".shp", ".shx", ".dbf", ".prj"):
        assert os.path.exists(tmp_path / ("tla" + ext))
