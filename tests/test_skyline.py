"""The skyline window formulation must equal the quadratic NOT-EXISTS
dominance definition — the proof that the single-pass plan computes
the textbook Pareto front, ties included."""

from __future__ import annotations

from ast_data_pipeline_spark.oracle import run_oracle_sql
from ast_data_pipeline_spark.registry import load_all

_BRUTE = """
WITH pts AS (
  SELECT o_orderkey, o_totalprice AS x, o_orderdate AS y FROM orders
)
SELECT p.o_orderkey FROM pts p
WHERE NOT EXISTS (
  SELECT 1 FROM pts q
  WHERE q.x >= p.x AND q.y <= p.y AND (q.x > p.x OR q.y < p.y)
)
"""


def test_skyline_equals_not_exists_dominance(spark, sf_dir):
    got = load_all()["a_skyline_2d"].fn(spark, sf_dir).toPandas()
    brute = run_oracle_sql(_BRUTE, sf_dir)
    assert sorted(got.o_orderkey) == sorted(brute.o_orderkey)
    assert len(got) > 0
