"""Pins for functions/dlog.py — deterministic ln/log2.

Three properties make pln/plog2 a valid hash-boundary primitive:
exactness of the power-of-two range reduction (pinned per engine),
accuracy vs libm (value truth), and Spark<->DuckDB bit-identity on
adversarial inputs INCLUDING near-power-of-two values where the two
libms' floor(log2(x)) seeds genuinely disagree (the correction step
must converge both engines to the same (el, m)).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from ast_data_pipeline_spark.functions.dlog import (
    pln_col,
    pln_sql,
    plog2_col,
    plog2_sql,
)


def _adversarial_values() -> np.ndarray:
    rng = np.random.RandomState(1229)
    vals = list(10.0 ** rng.uniform(-300, 300, 2000))
    # near powers of two: the libm floor(log2) seed is least stable
    # here, so the CASE correction is what's actually under test
    for k in range(-300, 301, 7):
        base = 2.0**k
        vals += [base, np.nextafter(base, 0), np.nextafter(base, np.inf)]
    # the integer-ratio shapes the entropy/PMI sites feed (n / len)
    vals += [n / d for n in (1, 2, 3, 17, 999) for d in (7, 1000, 12345)]
    return np.array(vals, dtype=np.float64)


def test_pow2_range_reduction_is_exact(spark):
    # pow(2.0, k) must be EXACTLY 2**k in both engines over the whole
    # exponent range the CLAMPED reduction can produce for positive
    # double inputs, [-1074, 1023] (ADVICE r12: previously pinned only
    # -300..300) — the premise that makes m = x / pow(2.0, el) an
    # exact division. Subnormal powers (k < -1022) are exactly
    # representable down to 2^-1074, so the pin covers them too.
    ks = np.arange(-1074, 1024, dtype=np.int64)
    exact = np.array([float(2.0**int(k)) for k in ks])
    pdf = pd.DataFrame({"k": ks.astype(np.float64)})
    got = (
        spark.createDataFrame(pdf)
        .select(F.pow(F.lit(2.0), F.col("k")).alias("p"))
        .toPandas()["p"]
        .to_numpy()
    )
    assert (got == exact).all()
    con = duckdb.connect()
    con.register("t", pdf)
    duck = con.execute("SELECT pow(2.0, k) AS p FROM t").df()["p"].to_numpy()
    assert (duck == exact).all()


def test_domain_edges_clamped_seed(spark):
    # ADVICE r12: the el0 seed clamp must make the reduction total at
    # the edges of the positive-double domain — DBL_MAX (a 1-ulp-high
    # libm log2 would otherwise seed el0=1024 -> pow=inf -> m0=0), the
    # smallest normal, and deep subnormals (a 1-ulp-low seed would hit
    # pow(2.0,-1075)=0 -> m0=inf). Both engines must return finite,
    # bit-identical, libm-accurate values.
    import math
    import sys

    edges = np.array(
        [
            sys.float_info.max,                       # 2^1024 - ulp
            np.nextafter(sys.float_info.max, 0.0),
            sys.float_info.min,                       # 2^-1022
            np.nextafter(sys.float_info.min, 0.0),    # largest subnormal
            5e-324,                                   # 2^-1074
            2.0**-1074 * 3,
        ],
        dtype=np.float64,
    )
    pdf = pd.DataFrame({"x": edges})
    got = (
        spark.createDataFrame(pdf)
        .select(pln_col(F.col("x")).alias("l"), plog2_col(F.col("x")).alias("g"))
        .toPandas()
    )
    assert np.isfinite(got["l"].to_numpy()).all()
    assert np.isfinite(got["g"].to_numpy()).all()
    assert np.allclose(got["l"], np.log(edges), rtol=1e-13, atol=2e-11)
    assert np.allclose(got["g"], np.log2(edges), rtol=1e-13, atol=2e-11)
    con = duckdb.connect()
    con.register("t", pdf)
    exp = con.execute(
        f"SELECT {pln_sql('x')} AS l, {plog2_sql('x')} AS g FROM t"
    ).df()
    assert (got["l"].to_numpy() == exp["l"].to_numpy()).all()
    assert (got["g"].to_numpy() == exp["g"].to_numpy()).all()


def test_pln_accuracy_vs_libm(spark):
    x = _adversarial_values()
    pdf = pd.DataFrame({"x": x})
    got = (
        spark.createDataFrame(pdf)
        .select(pln_col(F.col("x")).alias("l"), plog2_col(F.col("x")).alias("g"))
        .toPandas()
    )
    # error budget: atanh truncation < 2e-17, Horner rounding ~few
    # ulp, plus |el| * (LN2 literal error 2e-17) -> ~2e-14 abs at the
    # domain edges, relative ~1e-15 elsewhere
    assert np.allclose(got["l"], np.log(x), rtol=1e-13, atol=1e-13)
    assert np.allclose(got["g"], np.log2(x), rtol=1e-13, atol=1e-13)


def test_pln_sql_mirror_bit_exact(spark):
    x = _adversarial_values()
    pdf = pd.DataFrame({"x": x})
    got = (
        spark.createDataFrame(pdf)
        .select(pln_col(F.col("x")).alias("l"), plog2_col(F.col("x")).alias("g"))
        .toPandas()
    )
    con = duckdb.connect()
    con.register("t", pdf)
    exp = con.execute(
        f"SELECT {pln_sql('x')} AS l, {plog2_sql('x')} AS g FROM t"
    ).df()
    assert (got["l"].to_numpy() == exp["l"].to_numpy()).all()
    assert (got["g"].to_numpy() == exp["g"].to_numpy()).all()
