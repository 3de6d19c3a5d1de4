"""Accuracy bounds for the sketch-based aggregates (rows-only at the
driver gate; verified against exact values here)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ast_data_pipeline_spark.registry import load_all
from ast_data_pipeline_spark.sources.catalog import load


def test_approx_profile_bounds(spark, sf_dir):
    # r13 form: the query itself outputs exact anchors + within-band
    # booleans (now fully DuckDB-oracled; VERDICT r12 #4). This pytest
    # keeps an INDEPENDENT raw-sketch check so a band loosened by
    # accident would still be caught: recompute the sketches directly
    # and assert the tight (nominal-error) bounds.
    row = load_all()["a4_approx_profile"].fn(spark, sf_dir).collect()[0]
    assert row.parts_in_band and row.orders_in_band
    assert row.median_in_band and row.q25_in_band and row.q75_in_band
    li = load(spark, sf_dir, "lineitem")
    raw = li.agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("ap"),
        F.approx_count_distinct("l_orderkey", 0.02).alias("ao"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("mp"),
        F.countDistinct("l_partkey").alias("p"),
        F.countDistinct("l_orderkey").alias("o"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("m"),
    ).collect()[0]
    assert row.n_parts_exact == raw.p and row.n_orders_exact == raw.o
    # HLL++ with rsd=0.02: allow 5x headroom on the nominal error
    assert abs(raw.ap - raw.p) <= max(3, 0.1 * raw.p)
    assert abs(raw.ao - raw.o) <= max(3, 0.1 * raw.o)
    # percentile_approx with accuracy 10000 is near-exact at this scale
    assert abs(raw.mp - raw.m) <= 0.05 * raw.m


def test_exact_group_quantiles_matches_naive_on_random_data(spark):
    # Property: for arbitrary value distributions and ANY bucket width
    # (even degenerate single-bucket / one-row-per-bucket), distributed
    # rank selection returns exactly the naive single-window answer.
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ast_data_pipeline_spark.operators.quantiles import exact_group_quantiles

    rng = random.Random(11)
    probs = [("p25", 1, 4), ("p50", 2, 4), ("p75", 3, 4), ("p90", 9, 10)]
    for width in (1, 7, 1000, 10**9):
        rows = [
            (rng.choice("ABC"), rng.randint(-500, 500), i)
            for i in range(rng.randint(5, 400))
        ]
        df = spark.createDataFrame(rows, "g string, v long, k long")
        got = {
            r.g: (r.p25, r.p50, r.p75, r.p90)
            for r in exact_group_quantiles(
                df, "g", "v", "k", probs, F.expr(f"v div {width}")
            ).collect()
        }
        w = Window.partitionBy("g").orderBy("v", "k")
        ranked = df.select(
            "g", "v",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy("g")).alias("n"),
        )
        naive = {}
        for r in ranked.collect():
            for label, num, den in probs:
                if r.rn == ((r.n - 1) * num) // den + 1:
                    naive.setdefault(r.g, {})[label] = r.v
        naive = {g: (d["p25"], d["p50"], d["p75"], d["p90"]) for g, d in naive.items()}
        assert got == naive, (width, got, naive)
