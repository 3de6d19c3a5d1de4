"""Validation for the P9 transverse-Mercator implementation (no pyproj
in this environment, so correctness is established by mathematical
properties of the projection itself)."""

from __future__ import annotations

import numpy as np

from ast_data_pipeline_spark.functions.geo import (
    lonlat_to_utm_np,
    utm_to_lonlat_np,
)


def test_central_meridian_identity():
    # easting exactly 500000 must map to the zone's central meridian
    e = np.array([500000.0, 500000.0])
    n = np.array([3900000.0, 4000000.0])
    z = np.array([16, 17])
    lon, lat = utm_to_lonlat_np(e, n, z)
    assert np.allclose(lon, [16 * 6 - 183, 17 * 6 - 183], atol=1e-12)
    assert (lat > 30).all() and (lat < 40).all()


def test_roundtrip_inverse_forward():
    rng = np.random.RandomState(7)
    e = 400000.0 + rng.rand(500) * 200000.0  # within-zone eastings
    n = 3300000.0 + rng.rand(500) * 1500000.0
    z = np.where(rng.rand(500) < 0.5, 16, 17).astype(np.int64)
    lon, lat = utm_to_lonlat_np(e, n, z)
    e2, n2 = lonlat_to_utm_np(lon, lat, z)
    # round-trip closure well below the 0.6 m pixel
    assert np.abs(e2 - e).max() < 1e-3
    assert np.abs(n2 - n).max() < 1e-3


def test_native_cols_match_numpy(spark):
    # the codegen'd column form must agree with the numpy reference
    # far below pixel scale (both are double; JVM trig is 1-ulp)
    rng = np.random.RandomState(11)
    e = 400000.0 + rng.rand(300) * 200000.0
    n = 3300000.0 + rng.rand(300) * 1500000.0
    z = np.where(rng.rand(300) < 0.5, 16, 17).astype(np.int64)
    import pandas as pd
    from pyspark.sql import functions as F

    from ast_data_pipeline_spark.functions.geo import utm_to_lonlat_cols

    df = spark.createDataFrame(pd.DataFrame({"e": e, "n": n, "z": z}))
    lon_c, lat_c = utm_to_lonlat_cols(F.col("e"), F.col("n"), F.col("z"))
    got = df.select(lon_c.alias("lon"), lat_c.alias("lat")).toPandas()
    lon, lat = utm_to_lonlat_np(e, n, z)
    assert np.abs(got["lon"].to_numpy() - lon).max() < 1e-12
    assert np.abs(got["lat"].to_numpy() - lat).max() < 1e-12

    from ast_data_pipeline_spark.functions.geo import with_utm_lonlat

    staged = with_utm_lonlat(df, "lon", "lat", F.col("e"), F.col("n"), F.col("z"))
    got2 = staged.select("lon", "lat").toPandas()
    assert list(staged.columns) == ["e", "n", "z", "lon", "lat"]  # temps dropped
    assert np.abs(got2["lon"].to_numpy() - lon).max() < 1e-12
    assert np.abs(got2["lat"].to_numpy() - lat).max() < 1e-12


def test_known_point():
    # zone 16, a point ~1 degree east of the central meridian at ~35N:
    # forward-project a known lon/lat and invert back
    lon0, lat0 = np.array([-86.0]), np.array([35.0])
    z = np.array([16])
    e, n = lonlat_to_utm_np(lon0, lat0, z)
    # textbook sanity: east of CM -> easting > 500000; northern lat ~ 3.87e6
    assert e[0] > 500000.0
    assert 3.8e6 < n[0] < 3.95e6
    lon1, lat1 = utm_to_lonlat_np(e, n, z)
    assert abs(lon1[0] - lon0[0]) < 1e-8
    assert abs(lat1[0] - lat0[0]) < 1e-8
