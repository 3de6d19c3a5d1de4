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

# ---------------------------------------------------------------------
# Deterministic elementary trig for the hash-gated boundary.
#
# +,-,*,/,sqrt are IEEE-correctly-rounded in every engine, but built-in
# sin/cos/tan are only ~1-ulp (JVM Math vs DuckDB libm vs numpy), and a
# 1-ulp wobble crosses the flagship's %.7f output grid with probability
# ~1e-7 per formatted value. That held at sf0.1 (2.9M values) and broke
# at sf1: the r12 sf1 gate caught 2-in-29M grid straddles. Rather than
# coarsen the boundary, the engine carries its OWN sin/cos as Taylor-
# Horner polynomials in t = x^2 — every term a literal double constant,
# every op an exact IEEE +/*, so Spark codegen, the DuckDB oracle and
# any future engine produce identical BITS on every input. Valid for
# |x| <= ~1.47 rad (UTM's 84N latitude cap; truncation < 7e-17 there,
# at the double rounding floor). sin(2mu)..sin(8mu) come from the
# double-angle recurrences on (sin mu, cos mu) — products and sums
# only. tan = sin/cos (one exact division). Reproducibility is exact
# instead of probabilistic — green at one SF now means green at every
# SF.
#
# Term count (r13, VERDICT r12 #1): the r12 polynomials carried the
# full ~5e-16 libm-parity term count (sin to x^19, cos to x^20), but
# the output boundary's accuracy budget is set by the Snyder inverse
# series itself (~1e-9 rad truncation, module docstring) and the
# d_reproject_roundtrip <1 mm pin (1 mm ~ 1.57e-10 rad of latitude).
# Both series alternate with strictly decreasing terms for
# |x| <= 1.47 (x^2/((2k+2)(2k+3)) < 1), so the truncation error is
# bounded by the FIRST OMITTED TERM. With sin cut after x^15/15! and
# cos after x^14/14!, the worst-case bounds at the 1.47-rad domain
# edge are
#     sin: 1.47^17/17! = 1.97e-12 rad   (80x under the 1.57e-10 budget)
#     cos: 1.47^16/16! = 2.27e-11 rad   (6.9x under)
# and at the data's actual latitudes (<= 0.86 rad, CONUS) they fall
# to ~2e-16 / 4e-15 — the double rounding floor. Bit-identity across
# engines is unaffected by the cut (both sides evaluate the SAME
# literal tuple in the SAME Horner order); tests/test_geo.py pins the
# per-x truncation bound across the whole domain.
#
# Coefficients: sin x = x * (1 + sum_k t^k * (-1)^k/(2k+1)!),
#               cos x =      1 + sum_k t^k * (-1)^k/(2k)!.
_SIN_P = (
    -1 / 6, 1 / 120, -1 / 5040, 1 / 362880, -1 / 39916800,
    1 / 6227020800, -1 / 1307674368000,
)
_COS_P = (
    -1 / 2, 1 / 24, -1 / 720, 1 / 40320, -1 / 3628800,
    1 / 479001600, -1 / 87178291200,
)


def _horner_col(t, coefs):
    p = F.lit(coefs[-1])
    for c in reversed(coefs[:-1]):
        p = F.lit(c) + t * p
    return F.lit(1.0) + t * p


def psin_col(x):
    """Deterministic sin as a Spark column (|x| <= ~1.47 rad)."""
    t = x * x
    return x * _horner_col(t, _SIN_P)


def pcos_col(x):
    """Deterministic cos as a Spark column (|x| <= ~1.47 rad)."""
    t = x * x
    return _horner_col(t, _COS_P)


def _horner_sql(t: str, coefs) -> str:
    expr = repr(coefs[-1])
    for c in reversed(coefs[:-1]):
        expr = f"({c!r} + {t} * ({expr}))"
    return f"(1.0 + {t} * {expr})"


def psin_sql(x: str) -> str:
    """DuckDB mirror of :func:`psin_col` — token-for-token op order."""
    t = f"({x} * {x})"
    return f"({x} * {_horner_sql(t, _SIN_P)})"


def pcos_sql(x: str) -> str:
    """DuckDB mirror of :func:`pcos_col` — token-for-token op order."""
    t = f"({x} * {x})"
    return _horner_sql(t, _COS_P)


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
    Double-precision math throughout; trig comes from the
    deterministic :func:`psin_col`/:func:`pcos_col` polynomials (plus
    the double-angle recurrences for sin 2mu..8mu), so the result is
    BIT-identical to the DuckDB mirror on every input — no libm at
    the boundary (r12; see the module-level trig note).
    """
    sqrt1e2 = math.sqrt(1 - _E2)
    e1 = (1 - sqrt1e2) / (1 + sqrt1e2)
    x = easting - F.lit(_FALSE_EASTING)
    # ONE division by the fused constant — the same op order as
    # with_utm_lonlat and the SQL mirror's MU_DEN (ADVICE r12: the
    # previous two-division form (n/_K0)/(A*...) could differ in the
    # last ulp of mu from the staged/mirror path, silently voiding the
    # bit-identity claim below for anyone hash-gating this form).
    mu = northing / F.lit(_K0 * _A * (1 - _E2 / 4 - 3 * _E2**2 / 64 - 5 * _E2**3 / 256))
    smu, cmu = psin_col(mu), pcos_col(mu)
    sin2 = F.lit(2.0) * (smu * cmu)
    cos2 = F.lit(1.0) - F.lit(2.0) * (smu * smu)
    sin4 = F.lit(2.0) * (sin2 * cos2)
    cos4 = F.lit(1.0) - F.lit(2.0) * (sin2 * sin2)
    sin6 = sin4 * cos2 + cos4 * sin2
    sin8 = F.lit(2.0) * (sin4 * cos4)
    phi1 = (
        mu
        + F.lit(3 * e1 / 2 - 27 * e1**3 / 32) * sin2
        + F.lit(21 * e1**2 / 16 - 55 * e1**4 / 32) * sin4
        + F.lit(151 * e1**3 / 96) * sin6
        + F.lit(1097 * e1**4 / 512) * sin8
    )
    sin1 = psin_col(phi1)
    cos1 = pcos_col(phi1)
    tan1 = sin1 / cos1
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
    (mu, smu, cmu, sin2, cos2, sin4, cos4,
     phi1, sin1, cos1, tan1, c1, t1, n1, d) = (p + s for s in
        ("mu", "smu", "cmu", "sin2", "cos2", "sin4", "cos4",
         "phi1", "sin1", "cos1", "tan1", "c1", "t1", "n1", "d"))
    sqrt1e2 = math.sqrt(1 - _E2)
    e1 = (1 - sqrt1e2) / (1 + sqrt1e2)
    C = F.col
    # Staging protocol: one withColumns (ONE Project) per dependency
    # level — the r12 flagship bench showed per-column withColumn
    # chains stacking ~18 Projects per call site (x3 sites), which the
    # optimizer and codegen then re-walk; batching levels claws most
    # of that back. Single-use terms (sin6/sin8) are inlined into
    # phi1 — same expression tree, same doubles, one less column.
    df = df.withColumn(mu, northing / F.lit(_K0 * _A * (1 - _E2 / 4 - 3 * _E2**2 / 64 - 5 * _E2**3 / 256)))
    # Deterministic trig (module-level note): polynomial sin/cos of mu,
    # double-angle recurrences for the 2mu..8mu terms, tan = sin/cos —
    # bit-identical to the DuckDB mirror (utm_lonlat_staged_sql stages
    # the SAME names in the SAME op order).
    df = df.withColumns({smu: psin_col(C(mu)), cmu: pcos_col(C(mu))})
    df = df.withColumns({
        sin2: F.lit(2.0) * (C(smu) * C(cmu)),
        cos2: F.lit(1.0) - F.lit(2.0) * (C(smu) * C(smu)),
    })
    df = df.withColumns({
        sin4: F.lit(2.0) * (C(sin2) * C(cos2)),
        cos4: F.lit(1.0) - F.lit(2.0) * (C(sin2) * C(sin2)),
    })
    sin6 = C(sin4) * C(cos2) + C(cos4) * C(sin2)
    sin8 = F.lit(2.0) * (C(sin4) * C(cos4))
    df = df.withColumn(
        phi1,
        C(mu)
        + F.lit(3 * e1 / 2 - 27 * e1**3 / 32) * C(sin2)
        + F.lit(21 * e1**2 / 16 - 55 * e1**4 / 32) * C(sin4)
        + F.lit(151 * e1**3 / 96) * sin6
        + F.lit(1097 * e1**4 / 512) * sin8,
    )
    df = df.withColumns({sin1: psin_col(C(phi1)), cos1: pcos_col(C(phi1))})
    df = df.withColumns({
        tan1: C(sin1) / C(cos1),
        c1: F.lit(_EP2) * C(cos1) * C(cos1),
        n1: F.lit(_A) / F.sqrt(F.lit(1.0) - F.lit(_E2) * C(sin1) * C(sin1)),
    })
    df = df.withColumns({
        t1: C(tan1) * C(tan1),
        d: (easting - F.lit(_FALSE_EASTING)) / (C(n1) * F.lit(_K0)),
    })
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
    df = df.withColumns({out_lon: F.degrees(lon), out_lat: F.degrees(lat)})
    return df.drop(mu, smu, cmu, sin2, cos2, sin4, cos4,
                   phi1, sin1, cos1, tan1, c1, t1, n1, d)


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

    Bit-exactness contract (what makes a hash-gated oracle possible
    for a trig-heavy pipeline): every +,-,*,/,sqrt is IEEE-exact in
    both engines, and — since r12 — so is the trig: sin/cos come from
    the deterministic psin/pcos polynomials (identical literal
    coefficients, identical Horner order on both sides; see the
    module-level note) and tan is one exact division, so there is NO
    libm at the boundary at all. (The previous design let built-in
    sin/cos through and relied on the flagship's %.7f output format to
    absorb their ~1-ulp cross-engine wobble; at sf1 the ~1e-7
    straddle-per-value probability finally paid out — 2 flipped
    values in 29M formatted — caught by the r12 sf1 gate.) The series
    is transcribed with the exact association order of the Spark
    column tree, pow() is avoided (sqrt-cube on both sides), and
    radians/degrees are expanded to the JVM's literal order
    (x / 180.0 * pi(), x * 180.0 / pi()) rather than DuckDB's
    builtins. Green is now deterministic at EVERY scale, not
    probabilistically at one.

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
    # Mirror of with_utm_lonlat's staged columns, same names, same op
    # order: polynomial sin/cos of mu, double-angle recurrences for
    # 2mu..8mu, phi1, polynomial sin/cos of phi1, tan1 = sin1/cos1.
    lvl2a = ", ".join(
        f"{psin_sql(f'mu_{s}')} AS smu_{s}, {pcos_sql(f'mu_{s}')} AS cmu_{s}"
        for s, _e, _n in points
    )
    lvl2b = ", ".join(
        f"2.0 * (smu_{s} * cmu_{s}) AS sin2_{s}, "
        f"1.0 - 2.0 * (smu_{s} * smu_{s}) AS cos2_{s}"
        for s, _e, _n in points
    )
    lvl2c = ", ".join(
        f"2.0 * (sin2_{s} * cos2_{s}) AS sin4_{s}, "
        f"1.0 - 2.0 * (sin2_{s} * sin2_{s}) AS cos4_{s}"
        for s, _e, _n in points
    )
    lvl2d = ", ".join(
        f"sin4_{s} * cos2_{s} + cos4_{s} * sin2_{s} AS sin6_{s}, "
        f"2.0 * (sin4_{s} * cos4_{s}) AS sin8_{s}"
        for s, _e, _n in points
    )
    lvl2 = ", ".join(
        f"mu_{s} + {C2}*sin2_{s} + {C4}*sin4_{s} "
        f"+ {C6}*sin6_{s} + {C8}*sin8_{s} AS phi1_{s}"
        for s, _e, _n in points
    )
    lvl3 = ", ".join(
        f"{psin_sql(f'phi1_{s}')} AS sin1_{s}, "
        f"{pcos_sql(f'phi1_{s}')} AS cos1_{s}"
        for s, _e, _n in points
    )
    lvl3b = ", ".join(
        f"sin1_{s} / cos1_{s} AS tan1_{s}" for s, _e, _n in points
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
FROM (SELECT *, {lvl3b} FROM (SELECT *, {lvl3} FROM (SELECT *, {lvl2}
FROM (SELECT *, {lvl2d} FROM (SELECT *, {lvl2c} FROM (SELECT *, {lvl2b}
FROM (SELECT *, {lvl2a}
FROM (SELECT *, {lvl1} FROM ({inner_sql})))))))))))
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
