"""Aggregation query surface (SURVEY.md §2.5: A2-A8).

Each query = a DataFrame-first implementation + a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.exact import davg_sql, dsum, dsum_sql
from ..operators.aggregates import crosstab_with_margins, pricing_summary
from ..registry import register
from ..sources.catalog import load

PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]

_Q01_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {dsum_sql('l_quantity')}      AS sum_qty,
       {dsum_sql('l_extendedprice')} AS sum_base_price,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {davg_sql('l_quantity')}      AS avg_qty,
       {davg_sql('l_extendedprice')} AS avg_price,
       {davg_sql('l_discount')}      AS avg_disc,
       count(*)::BIGINT              AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register(
    "a8_pricing_summary",
    oracle=_Q01_ORACLE,
    doc="A8 counters/running totals as a TPC-H Q1-shaped multi-aggregate "
    "(ref: make-complete-dataset.py:50-61 counting pattern, generalized).",
    tags=("aggregate", "bench"),
)
def a8_pricing_summary(spark, sf_dir):
    return pricing_summary(load(spark, sf_dir, "lineitem"))


def _crosstab_oracle(normalize: bool) -> str:
    cells = ",\n       ".join(
        f"""sum(CASE WHEN o_orderpriority = '{p}' THEN 1 ELSE 0 END)::BIGINT AS "{p}" """
        for p in PRIORITIES
    )
    sums = ",\n       ".join(f'sum("{p}")::BIGINT AS "{p}"' for p in PRIORITIES)
    base = f"""
WITH j AS (
  SELECT n_name, o_orderpriority
  FROM orders JOIN customer ON o_custkey = c_custkey
              JOIN nation   ON c_nationkey = n_nationkey
),
p AS (
  SELECT n_name,
       {cells},
       count(*)::BIGINT AS "Total"
  FROM j GROUP BY n_name
),
m AS (
  SELECT 'Total' AS n_name,
       {sums},
       sum("Total")::BIGINT AS "Total"
  FROM p
),
u AS (SELECT * FROM p UNION ALL SELECT * FROM m)
"""
    if not normalize:
        return base + 'SELECT * FROM u ORDER BY (n_name = \'Total\'), "Total" DESC, n_name'
    cols = [*PRIORITIES, "Total"]
    norm = ",\n       ".join(f'"{c}" / g.grand AS "{c}"' for c in cols)
    return (
        base
        + f""",
g AS (SELECT "Total" AS grand FROM u WHERE n_name = 'Total')
SELECT u.n_name,
       {norm}
FROM u, g
ORDER BY (u.n_name = 'Total'), "{cols[-1]}" DESC, u.n_name
"""
    )


def _orders_by_nation(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select("n_name", "o_orderpriority")
    )


@register(
    "a3_crosstab_margins",
    oracle=_crosstab_oracle(False),
    doc="A3 crosstab with Total margins (ref: distribution_by_county_state.py:32-48 "
    "pd.crosstab(margins=True)) as groupBy().pivot() + margin union.",
    tags=("aggregate", "pivot", "bench"),
)
def a3_crosstab_margins(spark, sf_dir):
    return crosstab_with_margins(
        _orders_by_nation(spark, sf_dir), "n_name", "o_orderpriority", PRIORITIES
    )


@register(
    "a3_crosstab_normalized",
    oracle=_crosstab_oracle(True),
    doc="A3 crosstab normalize=True variant (ref: distribution_by_county_state.py:38,44): "
    "every cell divided by the grand total.",
    tags=("aggregate", "pivot"),
)
def a3_crosstab_normalized(spark, sf_dir):
    return crosstab_with_margins(
        _orders_by_nation(spark, sf_dir), "n_name", "o_orderpriority", PRIORITIES, normalize=True
    )


@register(
    "a4_distinct_profile",
    oracle="""
SELECT count(DISTINCT o_orderstatus)::BIGINT   AS n_status,
       count(DISTINCT o_orderpriority)::BIGINT AS n_priority,
       count(DISTINCT o_custkey)::BIGINT       AS n_custkeys,
       count(*)::BIGINT                        AS n_rows
FROM orders
""",
    doc="A4 distinct + cardinality profiling (ref: src/az_proc.py:349-389 "
    "unique states/years/resolutions).",
    tags=("aggregate",),
)
def a4_distinct_profile(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    return orders.agg(
        F.countDistinct("o_orderstatus").alias("n_status"),
        F.countDistinct("o_orderpriority").alias("n_priority"),
        F.countDistinct("o_custkey").alias("n_custkeys"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "q18_large_volume_customers",
    oracle=f"""
SELECT c_custkey, c_name, o_orderkey,
       {dsum_sql('l_quantity')} AS total_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name, o_orderkey
HAVING round(sum((l_quantity)::DECIMAL(30,10)), 4)::DOUBLE > 150
ORDER BY total_qty DESC, o_orderkey
""",
    doc="TPC-H Q18 shape: aggregate-with-HAVING over a join — the "
    "post-aggregation filter face (HAVING == filter after groupBy).",
    tags=("aggregate", "join"),
)
def q18_large_volume_customers(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey")
        .agg(dsum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
        .orderBy(F.col("total_qty").desc(), "o_orderkey")
    )


@register(
    "a4_approx_profile",
    oracle=None,  # HLL/KLL sketches are engine-specific; bounds pytest-checked
    doc="Approximate profiling: approx_count_distinct (HyperLogLog++) and "
    "percentile_approx over lineitem — the sketch-based face of A4 for "
    "cardinalities where exact distinct is too expensive at 100 TB. "
    "Accuracy bounds asserted in tests/test_approx.py.",
    tags=("aggregate", "approx"),
)
def a4_approx_profile(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("median_price_approx"),
        F.percentile_approx("l_quantity", [0.25, 0.75], 10000).alias("qty_quartiles"),
    )


@register(
    "a5_dedup_rows",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus, l_quantity FROM lineitem",
    doc="A5 dedup (ref: src/az_proc.py:251,293 drop_duplicates / np.unique) "
    "as dropDuplicates on a projection.",
    tags=("aggregate", "dedup"),
)
def a5_dedup_rows(spark, sf_dir):
    return (
        load(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus", "l_quantity")
        .dropDuplicates()
    )


@register(
    "a6_distinct_by_key_first",
    oracle="""
SELECT o_custkey,
       o_orderkey AS first_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS first_orderdate
FROM (
  SELECT o_custkey, o_orderkey, o_orderdate,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders
) WHERE rn = 1
""",
    doc="A6 distinct-by-key keeping first row (ref: src/form_calcs.py:105-116 "
    "np.unique(return_index=True)) as row_number()==1.",
    tags=("aggregate", "window"),
)
def a6_distinct_by_key_first(spark, sf_dir):
    from pyspark.sql import Window

    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("first_orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("first_orderdate"),
        )
    )
