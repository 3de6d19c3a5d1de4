"""The verification driver runs queries on its OWN SparkSession — the
engine must not depend on session.py's conf defaults. Simulate a
foreign session (different timezone) and check oracle parity still
holds for timestamp-sensitive queries."""

from __future__ import annotations

from ast_data_pipeline_spark.oracle import compare_frames, run_oracle_sql
from ast_data_pipeline_spark.registry import load_all


def test_foreign_session_timezone(spark, sf_dir):
    foreign = spark.newSession()
    foreign.conf.set("spark.sql.session.timeZone", "America/New_York")
    specs = load_all()
    for name in ["a6_distinct_by_key_first", "e_tumbling_window_agg", "e_sessionize"]:
        spec = specs[name]
        got = spec.fn(foreign, sf_dir).toPandas()
        problems = compare_frames(got, run_oracle_sql(spec.oracle, sf_dir))
        assert not problems, f"{name}: {problems}"
    # the engine pinned the foreign session back to UTC via the catalog
    assert foreign.conf.get("spark.sql.session.timeZone") == "UTC"
