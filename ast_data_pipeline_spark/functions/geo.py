"""P9 — UTM <-> WGS84 reprojection as a vectorized pandas UDF.

The reference calls pyproj per point (src/form_calcs.py:288-307,
re-constructing the Transformer inside the loop — an anti-pattern the
SURVEY flags). pyproj is not available in this environment, so the
engine implements the standard Snyder/USGS transverse-Mercator series
(public-domain formulas, USGS Professional Paper 1395) vectorized in
numpy: one Arrow batch per partition, all zones handled in one pass
via per-row central meridians.

EPSG:269xx (NAD83 / UTM zone xx N) uses the GRS80 ellipsoid; NAD83
and WGS84 agree to well under the 0.6 m pixel size, so the engine
treats the output as WGS84 lon/lat like the reference does. Series
accuracy is < 1e-9 rad within a UTM zone — far below pixel scale.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

# GRS80 ellipsoid (EPSG:269xx)
_A = 6378137.0
_F = 1.0 / 298.257222101
_K0 = 0.9996
_E2 = _F * (2 - _F)
_EP2 = _E2 / (1 - _E2)
_FALSE_EASTING = 500000.0


def utm_to_lonlat_np(easting: np.ndarray, northing: np.ndarray, zone: np.ndarray):
    """Inverse transverse Mercator (Snyder 1987, eqs. 8-17..8-25),
    vectorized; northern hemisphere."""
    e1 = (1 - np.sqrt(1 - _E2)) / (1 + np.sqrt(1 - _E2))
    x = easting - _FALSE_EASTING
    m = northing / _K0
    mu = m / (_A * (1 - _E2 / 4 - 3 * _E2**2 / 64 - 5 * _E2**3 / 256))
    phi1 = (
        mu
        + (3 * e1 / 2 - 27 * e1**3 / 32) * np.sin(2 * mu)
        + (21 * e1**2 / 16 - 55 * e1**4 / 32) * np.sin(4 * mu)
        + (151 * e1**3 / 96) * np.sin(6 * mu)
        + (1097 * e1**4 / 512) * np.sin(8 * mu)
    )
    sin1, cos1, tan1 = np.sin(phi1), np.cos(phi1), np.tan(phi1)
    c1 = _EP2 * cos1**2
    t1 = tan1**2
    n1 = _A / np.sqrt(1 - _E2 * sin1**2)
    r1 = _A * (1 - _E2) / (1 - _E2 * sin1**2) ** 1.5
    d = x / (n1 * _K0)
    lat = phi1 - (n1 * tan1 / r1) * (
        d**2 / 2
        - (5 + 3 * t1 + 10 * c1 - 4 * c1**2 - 9 * _EP2) * d**4 / 24
        + (61 + 90 * t1 + 298 * c1 + 45 * t1**2 - 252 * _EP2 - 3 * c1**2) * d**6 / 720
    )
    lon0 = np.deg2rad(zone.astype(np.float64) * 6.0 - 183.0)
    lon = lon0 + (
        d
        - (1 + 2 * t1 + c1) * d**3 / 6
        + (5 - 2 * c1 + 28 * t1 - 3 * c1**2 + 8 * _EP2 + 24 * t1**2) * d**5 / 120
    ) / cos1
    return np.rad2deg(lon), np.rad2deg(lat)


def lonlat_to_utm_np(lon: np.ndarray, lat: np.ndarray, zone: np.ndarray):
    """Forward transverse Mercator (Snyder 1987, eqs. 8-9..8-15) —
    used by tests to validate the inverse via round-trip."""
    phi = np.deg2rad(lat)
    lam = np.deg2rad(lon)
    lam0 = np.deg2rad(zone.astype(np.float64) * 6.0 - 183.0)
    sinp, cosp, tanp = np.sin(phi), np.cos(phi), np.tan(phi)
    n = _A / np.sqrt(1 - _E2 * sinp**2)
    t = tanp**2
    c = _EP2 * cosp**2
    a_ = cosp * (lam - lam0)
    m = _A * (
        (1 - _E2 / 4 - 3 * _E2**2 / 64 - 5 * _E2**3 / 256) * phi
        - (3 * _E2 / 8 + 3 * _E2**2 / 32 + 45 * _E2**3 / 1024) * np.sin(2 * phi)
        + (15 * _E2**2 / 256 + 45 * _E2**3 / 1024) * np.sin(4 * phi)
        - (35 * _E2**3 / 3072) * np.sin(6 * phi)
    )
    easting = _FALSE_EASTING + _K0 * n * (
        a_
        + (1 - t + c) * a_**3 / 6
        + (5 - 18 * t + t**2 + 72 * c - 58 * _EP2) * a_**5 / 120
    )
    northing = _K0 * (
        m
        + n * tanp * (
            a_**2 / 2
            + (5 - t + 9 * c + 4 * c**2) * a_**4 / 24
            + (61 - 58 * t + t**2 + 600 * c - 330 * _EP2) * a_**6 / 720
        )
    )
    return easting, northing


def utm_to_lonlat_cols(easting, northing, zone):
    """Inverse transverse Mercator as NATIVE column expressions — the
    same Snyder series as :func:`utm_to_lonlat_np`, but built from
    ``pyspark.sql.functions`` so the reprojection runs inside
    whole-stage codegen: no Python worker, no Arrow hop, and Catalyst
    can pipeline it with the surrounding projections.

    Returns ``(lon_col, lat_col)`` in degrees as one self-contained
    expression pair. NOTE: inlining these into a wide projection
    duplicates the whole series per consumer (observed 4x slowdown in
    the flagship when six lon/lat outputs each re-derived phi1/d) —
    DataFrame callers should use :func:`with_utm_lonlat`, which stages
    the shared subterms as named columns so each is computed once.
    Double-precision math
    throughout; JVM Math.sin/cos are 1-ulp, so agreement with the
    numpy path is far below the 0.6 m pixel scale.
    """
    sqrt1e2 = math.sqrt(1 - _E2)
    e1 = (1 - sqrt1e2) / (1 + sqrt1e2)
    x = easting - F.lit(_FALSE_EASTING)
    m = northing / F.lit(_K0)
    mu = m / F.lit(_A * (1 - _E2 / 4 - 3 * _E2**2 / 64 - 5 * _E2**3 / 256))
    phi1 = (
        mu
        + F.lit(3 * e1 / 2 - 27 * e1**3 / 32) * F.sin(mu * 2)
        + F.lit(21 * e1**2 / 16 - 55 * e1**4 / 32) * F.sin(mu * 4)
        + F.lit(151 * e1**3 / 96) * F.sin(mu * 6)
        + F.lit(1097 * e1**4 / 512) * F.sin(mu * 8)
    )
    sin1, cos1, tan1 = F.sin(phi1), F.cos(phi1), F.tan(phi1)
    c1 = F.lit(_EP2) * cos1 * cos1
    t1 = tan1 * tan1
    one_m_e2sin2 = F.lit(1.0) - F.lit(_E2) * sin1 * sin1
    sq = F.sqrt(one_m_e2sin2)
    n1 = F.lit(_A) / sq
    # x^1.5 as sqrt(x)^3: sqrt and * are IEEE-exact in every engine,
    # while pow() is only ~1-ulp — this keeps the series bit-identical
    # across Spark and the DuckDB oracle mirror (utm_lonlat_staged_sql)
    r1 = F.lit(_A * (1 - _E2)) / (sq * sq * sq)
    d = x / (n1 * F.lit(_K0))
    d2 = d * d
    d4 = d2 * d2
    lat = phi1 - (n1 * tan1 / r1) * (
        d2 / 2
        - (F.lit(5.0) + 3 * t1 + 10 * c1 - 4 * c1 * c1 - F.lit(9 * _EP2)) * d4 / 24
        + (F.lit(61.0) + 90 * t1 + 298 * c1 + 45 * t1 * t1 - F.lit(252 * _EP2) - 3 * c1 * c1)
        * (d4 * d2) / 720
    )
    lon0 = F.radians(zone.cast("double") * 6.0 - 183.0)
    lon = lon0 + (
        d
        - (F.lit(1.0) + 2 * t1 + c1) * (d2 * d) / 6
        + (F.lit(5.0) - 2 * c1 + 28 * t1 - 3 * c1 * c1 + F.lit(8 * _EP2) + 24 * t1 * t1)
        * (d4 * d) / 120
    ) / cos1
    return F.degrees(lon), F.degrees(lat)


def with_utm_lonlat(df, out_lon: str, out_lat: str, easting, northing, zone):
    """Append ``out_lon``/``out_lat`` (degrees) to ``df`` from UTM
    coordinates, staging the Snyder-series subterms (phi1, trig, d, …)
    as intermediate columns so each is evaluated ONCE inside codegen.

    CollapseProject inlines an alias into its consumer only when the
    alias is cheap or used once; every staged term below is non-cheap
    and multi-use, so Catalyst keeps the staging and the generated code
    matches the numpy dataflow — unlike the naive inlined form, whose
    duplicated series blew the generated method past JIT limits.
    """
    p = f"_tm_{out_lon}_"  # unique temp prefix per call site
    mu, phi1, sin1, cos1, tan1, c1, t1, n1, d = (p + s for s in
        ("mu", "phi1", "sin1", "cos1", "tan1", "c1", "t1", "n1", "d"))
    sqrt1e2 = math.sqrt(1 - _E2)
    e1 = (1 - sqrt1e2) / (1 + sqrt1e2)
    C = F.col
    df = df.withColumn(mu, northing / F.lit(_K0 * _A * (1 - _E2 / 4 - 3 * _E2**2 / 64 - 5 * _E2**3 / 256)))
    df = df.withColumn(
        phi1,
        C(mu)
        + F.lit(3 * e1 / 2 - 27 * e1**3 / 32) * F.sin(C(mu) * 2)
        + F.lit(21 * e1**2 / 16 - 55 * e1**4 / 32) * F.sin(C(mu) * 4)
        + F.lit(151 * e1**3 / 96) * F.sin(C(mu) * 6)
        + F.lit(1097 * e1**4 / 512) * F.sin(C(mu) * 8),
    )
    df = (
        df.withColumn(sin1, F.sin(C(phi1)))
        .withColumn(cos1, F.cos(C(phi1)))
        .withColumn(tan1, F.tan(C(phi1)))
    )
    df = (
        df.withColumn(c1, F.lit(_EP2) * C(cos1) * C(cos1))
        .withColumn(t1, C(tan1) * C(tan1))
        .withColumn(n1, F.lit(_A) / F.sqrt(F.lit(1.0) - F.lit(_E2) * C(sin1) * C(sin1)))
    )
    df = df.withColumn(d, (easting - F.lit(_FALSE_EASTING)) / (C(n1) * F.lit(_K0)))
    d2 = C(d) * C(d)
    d4 = d2 * d2
    # r1 is single-use -> safe to inline into lat. x^1.5 is computed as
    # sqrt(x)^3 (sqrt and * are IEEE-exact everywhere, pow is only
    # ~1-ulp) so the whole series is bit-identical to the DuckDB
    # oracle mirror (utm_lonlat_staged_sql).
    _sq = F.sqrt(F.lit(1.0) - F.lit(_E2) * C(sin1) * C(sin1))
    r1 = F.lit(_A * (1 - _E2)) / (_sq * _sq * _sq)
    lat = C(phi1) - (C(n1) * C(tan1) / r1) * (
        d2 / 2
        - (F.lit(5.0) + 3 * C(t1) + 10 * C(c1) - 4 * C(c1) * C(c1) - F.lit(9 * _EP2)) * d4 / 24
        + (F.lit(61.0) + 90 * C(t1) + 298 * C(c1) + 45 * C(t1) * C(t1) - F.lit(252 * _EP2) - 3 * C(c1) * C(c1))
        * (d4 * d2) / 720
    )
    lon0 = F.radians(zone.cast("double") * 6.0 - 183.0)
    lon = lon0 + (
        C(d)
        - (F.lit(1.0) + 2 * C(t1) + C(c1)) * (d2 * C(d)) / 6
        + (F.lit(5.0) - 2 * C(c1) + 28 * C(t1) - 3 * C(c1) * C(c1) + F.lit(8 * _EP2) + 24 * C(t1) * C(t1))
        * (d4 * C(d)) / 120
    ) / C(cos1)
    df = df.withColumn(out_lon, F.degrees(lon)).withColumn(out_lat, F.degrees(lat))
    return df.drop(mu, phi1, sin1, cos1, tan1, c1, t1, n1, d)


_LONLAT_SCHEMA = StructType(
    [StructField("lon", DoubleType()), StructField("lat", DoubleType())]
)


@F.pandas_udf(_LONLAT_SCHEMA)
def utm_to_lonlat_udf(easting: pd.Series, northing: pd.Series, zone: pd.Series) -> pd.DataFrame:
    lon, lat = utm_to_lonlat_np(
        easting.to_numpy(np.float64), northing.to_numpy(np.float64),
        zone.to_numpy(np.float64),
    )
    return pd.DataFrame({"lon": lon, "lat": lat})


_UTM_SCHEMA = StructType(
    [StructField("easting", DoubleType()), StructField("northing", DoubleType())]
)


@F.pandas_udf(_UTM_SCHEMA)
def lonlat_to_utm_udf(lon: pd.Series, lat: pd.Series, zone: pd.Series) -> pd.DataFrame:
    """Forward transverse Mercator (lonlat -> UTM) as an Arrow-batched
    pandas UDF over :func:`lonlat_to_utm_np` — the verification leg of
    the P9 roundtrip (d_reproject_roundtrip)."""
    easting, northing = lonlat_to_utm_np(
        lon.to_numpy(np.float64), lat.to_numpy(np.float64),
        zone.to_numpy(np.float64),
    )
    return pd.DataFrame({"easting": easting, "northing": northing})


def zone_from_epsg(utm_projection):
    """'EPSG:26916' -> 16 (NAD83 northern zones are 269xx)."""
    return F.substring(utm_projection, 9, 2).cast("int")


def utm_lonlat_staged_sql(
    inner_sql: str, points: list[tuple[str, str, str]], zone_expr: str
) -> str:
    """DuckDB mirror of :func:`with_utm_lonlat` — wraps ``inner_sql``
    in staged subselects computing ``lon_<sfx>``/``lat_<sfx>`` (degrees,
    DOUBLE) for each ``(sfx, easting_expr, northing_expr)`` point.

    Bit-exactness contract (what makes a hash-gated oracle possible for
    a trig-heavy pipeline): every +,-,*,/,sqrt is IEEE-exact in both
    engines, so the ONLY cross-engine risk is sin/cos/tan (~1-ulp libm
    vs JVM differences on ~0.3% of inputs — measured). The series is
    transcribed with the exact association order of the Spark column
    tree, pow() is avoided (sqrt-cube on both sides), and radians/
    degrees are expanded to the JVM's literal order (x / 180.0 * pi(),
    x * 180.0 / pi()) rather than DuckDB's builtins. Residual 1-ulp
    trig wobble (~1e-14 deg) is absorbed by the %.7f boundary format
    the flagship emits — a 1-ulp difference crosses a 1e-7 grid with
    probability ~1e-8 per value, and deterministically: green once at
    a given SF means green forever.

    Staging mirrors Spark's named-column staging only for DuckDB parse
    economy — textual duplication would be value-identical but blows
    the expression tree up combinatorially (phi1 ~ 5 mu terms, t1 = 2
    phi1, ...).
    """
    sqrt1e2 = math.sqrt(1 - _E2)
    e1 = (1 - sqrt1e2) / (1 + sqrt1e2)
    MU_DEN = repr(_K0 * _A * (1 - _E2 / 4 - 3 * _E2**2 / 64 - 5 * _E2**3 / 256))
    C2 = repr(3 * e1 / 2 - 27 * e1**3 / 32)
    C4 = repr(21 * e1**2 / 16 - 55 * e1**4 / 32)
    C6 = repr(151 * e1**3 / 96)
    C8 = repr(1097 * e1**4 / 512)
    E2 = repr(_E2)
    EP2 = repr(_EP2)
    A = repr(_A)
    AR1 = repr(_A * (1 - _E2))
    K0 = repr(_K0)
    FE = repr(_FALSE_EASTING)
    E9 = repr(9 * _EP2)
    E252 = repr(252 * _EP2)
    E8 = repr(8 * _EP2)

    lvl1 = ", ".join(
        [f"({zone_expr}) AS _tm_zone"]
        + [f"({n}) / {MU_DEN} AS mu_{s}" for s, _e, n in points]
        + [f"({e}) AS _tme_{s}" for s, e, _n in points]
    )
    lvl2 = ", ".join(
        f"mu_{s} + {C2}*sin(mu_{s}*2) + {C4}*sin(mu_{s}*4) "
        f"+ {C6}*sin(mu_{s}*6) + {C8}*sin(mu_{s}*8) AS phi1_{s}"
        for s, _e, _n in points
    )
    lvl3 = ", ".join(
        f"sin(phi1_{s}) AS sin1_{s}, cos(phi1_{s}) AS cos1_{s}, "
        f"tan(phi1_{s}) AS tan1_{s}"
        for s, _e, _n in points
    )
    lvl4 = ", ".join(
        f"{EP2} * cos1_{s} * cos1_{s} AS c1_{s}, "
        f"tan1_{s} * tan1_{s} AS t1_{s}, "
        f"{A} / sqrt(1.0 - {E2} * sin1_{s} * sin1_{s}) AS n1_{s}, "
        f"sqrt(1.0 - {E2} * sin1_{s} * sin1_{s}) AS sq_{s}"
        for s, _e, _n in points
    )
    lvl5 = ", ".join(
        f"(_tme_{s} - {FE}) / (n1_{s} * {K0}) AS d_{s}" for s, _e, _n in points
    )
    outs = []
    for s, _e, _n in points:
        d, d2, d4 = f"d_{s}", f"(d_{s} * d_{s})", f"((d_{s} * d_{s}) * (d_{s} * d_{s}))"
        c1, t1, n1, sin1, cos1, tan1, phi1, sq = (
            f"c1_{s}", f"t1_{s}", f"n1_{s}", f"sin1_{s}", f"cos1_{s}",
            f"tan1_{s}", f"phi1_{s}", f"sq_{s}",
        )
        r1 = f"({AR1} / (({sq} * {sq}) * {sq}))"
        lat = (
            f"{phi1} - ({n1} * {tan1} / {r1}) * ({d2} / 2 "
            f"- (5.0 + 3*{t1} + 10*{c1} - 4*{c1}*{c1} - {E9}) * {d4} / 24 "
            f"+ (61.0 + 90*{t1} + 298*{c1} + 45*{t1}*{t1} - {E252} - 3*{c1}*{c1}) "
            f"* ({d4} * {d2}) / 720)"
        )
        lon0 = "((_tm_zone::DOUBLE * 6.0 - 183.0) / 180.0 * pi())"
        lon = (
            f"{lon0} + ({d} "
            f"- (1.0 + 2*{t1} + {c1}) * ({d2} * {d}) / 6 "
            f"+ (5.0 - 2*{c1} + 28*{t1} - 3*{c1}*{c1} + {E8} + 24*{t1}*{t1}) "
            f"* ({d4} * {d}) / 120) / {cos1}"
        )
        outs.append(f"(({lon}) * 180.0 / pi()) AS lon_{s}")
        outs.append(f"(({lat}) * 180.0 / pi()) AS lat_{s}")
    return f"""
SELECT *, {', '.join(outs)}
FROM (SELECT *, {lvl5} FROM (SELECT *, {lvl4}
FROM (SELECT *, {lvl3} FROM (SELECT *, {lvl2}
FROM (SELECT *, {lvl1} FROM ({inner_sql}))))))
"""


def bbox_wkt(minx, miny, maxx, maxy):
    """P11: axis-aligned bbox -> rectangle POLYGON WKT (5-point ring,
    ref src/form_calcs.py:919-920 builds the same 4-corner polygon)."""
    c = lambda v: F.format_string("%.9f", v)
    return F.concat(
        F.lit("POLYGON (("),
        c(minx), F.lit(" "), c(miny), F.lit(", "),
        c(maxx), F.lit(" "), c(miny), F.lit(", "),
        c(maxx), F.lit(" "), c(maxy), F.lit(", "),
        c(minx), F.lit(" "), c(maxy), F.lit(", "),
        c(minx), F.lit(" "), c(miny), F.lit("))"),
    )
