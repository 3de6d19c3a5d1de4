"""Lockstep gate: every domain view's Spark builder must produce exactly
the same rows as its DuckDB CTE text — otherwise every domain oracle
downstream is comparing different inputs.
"""

from __future__ import annotations

import pytest

from ast_data_pipeline_spark.oracle import compare_frames, run_oracle_sql
from ast_data_pipeline_spark.sources import domain_views


@pytest.mark.parametrize("name", list(domain_views.BUILDERS))
def test_view_lockstep(spark, sf_dir, name):
    got = domain_views.BUILDERS[name](spark, sf_dir).toPandas()
    want = run_oracle_sql(
        domain_views.with_domain(f"SELECT * FROM {name}", name), sf_dir
    )
    problems = compare_frames(got, want)
    assert not problems, f"{name}: " + "; ".join(problems)
    assert len(got) > 0
