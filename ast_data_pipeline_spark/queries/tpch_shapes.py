"""Additional TPC-H-shaped relational benchmarks (Q4/Q10/Q14/Q19
analogues on the driver's synthetic star schema).

The reference has no relational benchmark surface; these shapes pin
down join-strategy behavior the 100 TB design depends on: existential
semi joins (Q4), join+agg+top-k (Q10), broadcast dim join feeding a
conditional global aggregate (Q14), and disjunctive multi-predicate
join pushdown (Q19).  Columns absent from the synthetic schema
(commitdate, shipmode, container) are replaced by equivalent
predicates on existing columns — the plan shape is what's exercised.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.exact import dsum, dsum_sql
from ..registry import register
from ..sources.catalog import load


@register(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, count(*)::BIGINT AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL '60 days'
  )
GROUP BY o_orderpriority
""",
    doc="TPC-H Q4 shape: existential semi join (orders having a "
    "late-shipped lineitem, >60 days after order date). Spark LEFT "
    "SEMI join with a non-equi residual — the date filter prunes the "
    "orders scan before the shuffle.",
    tags=("tpch", "join", "bench"),
)
def q4_order_priority(spark, sf_dir):
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-04-01")
    )
    li = load(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("interval 60 days")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@register(
    "q10_returned_items",
    oracle=f"""
SELECT c.c_custkey, c.c_name, n.n_name,
       {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-07-01'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
""",
    doc="TPC-H Q10 shape: top-20 customers by returned-item revenue. "
    "nation broadcast; orders date filter pushed to the scan; unique "
    "c_custkey tiebreak keeps the LIMIT deterministic.",
    tags=("tpch", "join", "bench"),
)
def q10_returned_items(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-07-01")
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load(spark, sf_dir, "nation")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q14_promo_revenue",
    oracle=f"""
SELECT (100.0 * a / b) AS promo_revenue
FROM (
  SELECT {dsum_sql("CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0.0 END")} AS a,
         {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS b
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
    AND l.l_shipdate < TIMESTAMP '1996-02-01'
)
""",
    doc="TPC-H Q14 shape: promo revenue share for one month. part is "
    "broadcast; the two conditional sums fold into one aggregate pass; "
    "the final ratio divides two decimal-exact doubles (deterministic).",
    tags=("tpch", "join"),
)
def q14_promo_revenue(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-02-01")
    )
    part = load(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    agg = j.agg(
        dsum(F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0))).alias("a"),
        dsum(disc).alias("b"),
    )
    return agg.select((100.0 * F.col("a") / F.col("b")).alias("promo_revenue"))


@register(
    "q19_disjunctive_join",
    oracle=f"""
SELECT {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       count(*)::BIGINT AS n_lines
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 1 AND 15)
   OR (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 5 AND 20
       AND l.l_quantity BETWEEN 10 AND 25)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 10 AND 40
       AND l.l_quantity BETWEEN 20 AND 50)
""",
    doc="TPC-H Q19 shape: disjunctive brand/size/quantity predicates. "
    "The part-side disjunction (brand+size) is pushed below the "
    "broadcast join; the mixed l+p residual evaluates post-join in one "
    "codegen stage.",
    tags=("tpch", "join"),
)
def q19_disjunctive_join(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#1") & s.between(1, 10) & q.between(1, 15))
        | ((b == "Brand#12") & s.between(5, 20) & q.between(10, 25))
        | ((b == "Brand#23") & s.between(10, 40) & q.between(20, 50))
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.filter(cond).agg(
        dsum(disc).alias("revenue"), F.count(F.lit(1)).alias("n_lines")
    )
