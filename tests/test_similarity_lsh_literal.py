"""r14 optimization guard: the Python-literal LSH plane coefficients
(`operators.similarity._plane_coeff`) must equal the md5 derivation the
DuckDB oracles still spell out (`rh_lsh_bucket_sql`), for every
(plane, coord) pair in use.

The Spark side stopped embedding 384 foldable md5/conv subtrees per
call site in r14 (plan-size optimization); this test is what keeps the
two derivations lockstep — if either side's recipe drifts, the bucket
assignment (and thus every LSH query's candidate set) silently changes.
"""

import duckdb

from ast_data_pipeline_spark.operators.similarity import _plane_coeff
from ast_data_pipeline_spark.queries.similarity import EMB_DIM, LSH_PLANES


def test_plane_coeffs_match_oracle_md5_derivation():
    con = duckdb.connect()
    rows = con.execute(
        """
        SELECT p, i,
               ((('0x' || substr(md5(p::VARCHAR || '|' || i::VARCHAR), 1, 6))::BIGINT
                 % 2001) - 1000) AS c
        FROM generate_series(0, ?) t(p), generate_series(0, ?) s(i)
        """,
        [LSH_PLANES - 1, EMB_DIM - 1],
    ).fetchall()
    assert len(rows) == LSH_PLANES * EMB_DIM
    for p, i, c in rows:
        assert _plane_coeff(p, i) == c, (p, i, c, _plane_coeff(p, i))


def test_plane_coeff_range():
    vals = [_plane_coeff(p, i) for p in range(LSH_PLANES) for i in range(EMB_DIM)]
    assert all(-1000 <= v <= 1000 for v in vals)
    # the hyperplanes must not be degenerate (all-zero / constant-sign)
    assert any(v < 0 for v in vals) and any(v > 0 for v in vals)
