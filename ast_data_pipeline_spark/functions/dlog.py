"""Deterministic ln/log2 — the psin/pcos treatment applied to log.

The engine's ln-quantizer sites ('%.7f' of a libm log, see
``functions/exact.py``'s q7 scope note) absorb ~1-ulp cross-engine
libm wobble probabilistically: a wobbling input still straddles the
quantizer's grid with probability ~wobble/grid per value. This module
removes the wobble at the source, the same way ``functions/geo.py``
retired libm sin/cos in r12:

1. **Exact range reduction.** ``el0 = floor(log2(x))`` comes from
   libm and may differ by +/-1 between engines near powers of two;
   ``m0 = x / pow(2.0, el0)`` is an EXACT division (powers of two are
   exactly representable and ``pow(2.0, integer)`` is exact in every
   engine — pinned by tests/test_dlog.py over the full exponent range
   used). One CASE correction step then canonicalizes to
   ``m in [1, 2)`` — and because a 1-ulp log2 error moves ``el0`` by
   at most 1, BOTH engines converge to the identical (el, m) pair
   regardless of whose libm wobbled: engine-identical bits from a
   non-deterministic starting point.
2. **atanh series.** ``r = (m-1)/(m+1)`` (r in [0, 1/3)),
   ``ln m = 2r * (1 + t*(1/3 + t*(1/5 + ...)))`` with ``t = r*r`` —
   16 Horner terms, truncation < 2e-17 at r = 1/3; every op an exact
   IEEE +,*,/ with literal double coefficients, identical in Spark
   codegen and the DuckDB mirror.
3. ``ln x = ln m + el*LN2``; ``log2 x = el + ln m * LOG2E``. The
   literal LN2/LOG2E round once (identically), bounding abs error at
   ~|el|*2e-17 — orders below the 1e-7 quantizer grid these sites
   currently round to.

Migration status (r12): capability + pins land this round; the ~15
ln-quantizer call sites keep their documented '%.7f' recipe until a
round with freshness budget to re-gate them all (swapping a gated
site's formula re-stales its whole module — VERDICT r11 #2 asked the
opposite). New hash-gated log sites should use pln/plog2 directly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

LN2 = 0.6931471805599453  # nearest double to ln 2
LOG2E = 1.4426950408889634  # nearest double to 1/ln 2

# atanh-series coefficients 1/(2k+1), k = 1..16 (r <= 1/3 after range
# reduction -> t = r^2 <= 1/9; term 17 would be < 2e-17 of the sum).
_ATANH_P = tuple(1.0 / (2 * k + 1) for k in range(1, 17))


def _mantissa_exponent(x: Column) -> tuple[Column, Column]:
    """Engine-identical (el, m) with x = m * 2**el, m in [1, 2).

    The CASE correction below absorbs a +/-1 libm error in the seed —
    but only if ``pow(2.0, el0)`` stays finite and nonzero. At the
    domain edges a 1-ulp-high log2 near DBL_MAX yields el0 = 1024 ->
    pow = inf -> m0 = 0, and a 1-ulp-low log2 at the smallest
    subnormal yields el0 = -1075 -> pow = 0 -> m0 = inf (ADVICE r12).
    Clamping the seed to the true exponent range of a positive double,
    [-1074, 1023], is a no-op everywhere else (the true el is always
    inside it, so a clamped seed is still within +/-1 of truth) and
    makes the correction total over the full positive-double domain.
    """
    el0 = F.greatest(
        F.least(F.floor(F.log2(x)), F.lit(1023).cast("long")),
        F.lit(-1074).cast("long"),
    )  # libm seed, clamped; may be off by one near 2**k
    m0 = x / F.pow(F.lit(2.0), el0)  # exact: power-of-two division
    el = (
        F.when(m0 >= F.lit(2.0), el0 + F.lit(1).cast("long"))
        .when(m0 < F.lit(1.0), el0 - F.lit(1).cast("long"))
        .otherwise(el0)
    )
    m = (
        F.when(m0 >= F.lit(2.0), m0 / F.lit(2.0))
        .when(m0 < F.lit(1.0), m0 * F.lit(2.0))
        .otherwise(m0)
    )
    return el, m


def _lnm(m: Column) -> Column:
    r = (m - F.lit(1.0)) / (m + F.lit(1.0))
    t = r * r
    p = F.lit(_ATANH_P[-1])
    for c in reversed(_ATANH_P[:-1]):
        p = F.lit(c) + t * p
    return F.lit(2.0) * r * (F.lit(1.0) + t * p)


def pln_col(x: Column) -> Column:
    """Deterministic natural log of a positive double column."""
    el, m = _mantissa_exponent(x)
    return _lnm(m) + el.cast("double") * F.lit(LN2)


def plog2_col(x: Column) -> Column:
    """Deterministic base-2 log of a positive double column."""
    el, m = _mantissa_exponent(x)
    return el.cast("double") + _lnm(m) * F.lit(LOG2E)


def _mantissa_exponent_sql(x: str) -> tuple[str, str]:
    # same [-1074, 1023] seed clamp as _mantissa_exponent (ADVICE r12)
    el0 = f"greatest(least(floor(log2({x})), 1023), -1074)"
    m0 = f"(({x}) / pow(2.0, {el0}))"
    el = (
        f"(CASE WHEN {m0} >= 2.0 THEN {el0} + 1 "
        f"WHEN {m0} < 1.0 THEN {el0} - 1 ELSE {el0} END)"
    )
    m = (
        f"(CASE WHEN {m0} >= 2.0 THEN {m0} / 2.0 "
        f"WHEN {m0} < 1.0 THEN {m0} * 2.0 ELSE {m0} END)"
    )
    return el, m


def _lnm_sql(m: str) -> str:
    r = f"((({m}) - 1.0) / (({m}) + 1.0))"
    t = f"({r} * {r})"
    p = repr(_ATANH_P[-1])
    for c in reversed(_ATANH_P[:-1]):
        p = f"({c!r} + {t} * ({p}))"
    return f"(2.0 * {r} * (1.0 + {t} * {p}))"


def pln_sql(x: str) -> str:
    """DuckDB mirror of :func:`pln_col` — identical (el, m) and series.

    NOTE: textual duplication of el/m subterms is value-safe (each
    occurrence computes the identical double) but parse-heavy; stage
    el/m as named columns in big oracles, exactly like
    ``geo.utm_lonlat_staged_sql`` stages the Snyder subterms.
    """
    el, m = _mantissa_exponent_sql(x)
    return f"({_lnm_sql(m)} + ({el})::DOUBLE * {LN2!r})"


def plog2_sql(x: str) -> str:
    """DuckDB mirror of :func:`plog2_col`."""
    el, m = _mantissa_exponent_sql(x)
    return f"(({el})::DOUBLE + {_lnm_sql(m)} * {LOG2E!r})"
