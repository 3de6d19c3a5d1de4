"""Aggregation query surface (SURVEY.md §2.5: A2-A8).

Each query = a DataFrame-first implementation + a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ast_data_pipeline_spark.lineage import lineage_cut_lazy

from ..functions.exact import davg_sql, dsum, dsum_sql
from ..operators.aggregates import crosstab_with_margins, pricing_summary
from ..operators.text import CHAR_ENTROPY_CTES, quality_score_sql
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
    # r14: scan-parallelism floor (sources/parallel.py). The Q1 shape
    # fuses 9 decimal partial aggregates into the scan stage; on the
    # single-row-group testdata layout that stage is capped at ONE
    # task, so the whole query ran on one core (1.20 s at sf0.1).
    # The gated repartition costs one narrow shuffle of the fact and
    # buys full-width parallel aggregation (0.61 s measured); on a
    # healthy multi-row-group warehouse layout it is a no-op. dsum
    # aggregates exact decimals, so partitioning cannot move results.
    from ..sources.parallel import scan_floor

    li = scan_floor(spark, sf_dir, "lineitem", load(spark, sf_dir, "lineitem"))
    return pricing_summary(li)


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
    # Error-band oracle (VERDICT r12 #4, closing the registry's last
    # no_oracle row): the sketch VALUES are engine-specific (Spark
    # HLL++/GK vs DuckDB HLL/t-digest), so EACH ENGINE computes its
    # own sketch AND its own exact statistic and the gated row carries
    # only the exact anchors plus within-band booleans — the same
    # recipe a_kmv_distinct_sketch / a_hyperloglog_eval use for their
    # from-scratch sketches. Bands, vs measured behavior (both engines
    # deterministic per input): cardinality rel-err < 5% (Spark
    # rsd=0.02 -> observed <= 1.0%; DuckDB HLL observed <= 0.5%);
    # quantile estimates within the exact [p-0.01, p+0.01] (median)
    # and [p-0.03, p+0.03] (quartiles) rank bands — theoretical rank
    # error is 1e-4 (accuracy=10000) for Spark's GK and ~1e-3 for
    # DuckDB's t-digest at the quartiles.
    oracle="""
WITH s AS (
  SELECT count(DISTINCT l_partkey)::BIGINT        AS n_parts_exact,
         count(DISTINCT l_orderkey)::BIGINT       AS n_orders_exact,
         approx_count_distinct(l_partkey)::BIGINT  AS ap,
         approx_count_distinct(l_orderkey)::BIGINT AS ao,
         approx_quantile(l_extendedprice, 0.5)  AS mp,
         quantile_cont(l_extendedprice, 0.49)   AS p_lo,
         quantile_cont(l_extendedprice, 0.51)   AS p_hi,
         approx_quantile(l_quantity, 0.25)      AS q25,
         approx_quantile(l_quantity, 0.75)      AS q75,
         quantile_cont(l_quantity, 0.22)        AS q25_lo,
         quantile_cont(l_quantity, 0.28)        AS q25_hi,
         quantile_cont(l_quantity, 0.72)        AS q75_lo,
         quantile_cont(l_quantity, 0.78)        AS q75_hi
  FROM lineitem
)
SELECT n_parts_exact, n_orders_exact,
       abs(ap - n_parts_exact)  < 0.05 * n_parts_exact  AS parts_in_band,
       abs(ao - n_orders_exact) < 0.05 * n_orders_exact AS orders_in_band,
       (mp  BETWEEN p_lo   AND p_hi)   AS median_in_band,
       (q25 BETWEEN q25_lo AND q25_hi) AS q25_in_band,
       (q75 BETWEEN q75_lo AND q75_hi) AS q75_in_band
FROM s
""",
    doc="Approximate profiling: approx_count_distinct (HyperLogLog++) and "
    "percentile_approx over lineitem — the sketch-based face of A4 for "
    "cardinalities where exact distinct is too expensive at 100 TB. "
    "Gated as exact anchors + error-band booleans (each engine checks "
    "its own native sketch against its own exact statistic); raw "
    "accuracy bounds additionally asserted in tests/test_approx.py.",
    tags=("aggregate", "approx"),
)
def a4_approx_profile(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    # One GK sketch for both quantity quantiles (array form), unpacked
    # inline: two separate percentile_approx calls would build two
    # sketches over the same column.
    agg = li.agg(
        F.countDistinct("l_partkey").alias("n_parts_exact"),
        F.countDistinct("l_orderkey").alias("n_orders_exact"),
        F.approx_count_distinct("l_partkey", 0.02).alias("_ap"),
        F.approx_count_distinct("l_orderkey", 0.02).alias("_ao"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("_mp"),
        F.expr("percentile(l_extendedprice, array(0.49, 0.51))").alias("_pb"),
        F.percentile_approx(
            "l_quantity", F.array(F.lit(0.25), F.lit(0.75)), 10000
        ).alias("_qq"),
        F.expr(
            "percentile(l_quantity, array(0.22, 0.28, 0.72, 0.78))"
        ).alias("_qb"),
    )
    e = F.element_at
    return agg.select(
        "n_parts_exact",
        "n_orders_exact",
        (
            F.abs(F.col("_ap") - F.col("n_parts_exact"))
            < 0.05 * F.col("n_parts_exact")
        ).alias("parts_in_band"),
        (
            F.abs(F.col("_ao") - F.col("n_orders_exact"))
            < 0.05 * F.col("n_orders_exact")
        ).alias("orders_in_band"),
        F.col("_mp").between(e("_pb", 1), e("_pb", 2)).alias("median_in_band"),
        e("_qq", 1).between(e("_qb", 1), e("_qb", 2)).alias("q25_in_band"),
        e("_qq", 2).between(e("_qb", 3), e("_qb", 4)).alias("q75_in_band"),
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


# ---- multi-level aggregation (ROLLUP / CUBE / GROUPING SETS) -----------
# Not in the reference (its crosstab A3 hand-builds one margin level;
# src/volume_estimation.py pd.crosstab margins=True) — ROLLUP/CUBE
# generalize that to the full lattice, computed in ONE pass: Spark
# expands grouping sets inside a single hash-aggregate + one shuffle,
# not one job per level.

_GID_SQL = (
    "(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus))::BIGINT AS gid"
)


@register(
    "a_rollup_priority_status",
    oracle=f"""
SELECT coalesce(o_orderpriority, 'ALL') AS priority,
       coalesce(o_orderstatus, 'ALL')  AS status,
       {_GID_SQL},
       count(*)::BIGINT AS n_orders,
       {dsum_sql('o_totalprice')} AS sum_total
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
""",
    doc="Hierarchical subtotals: (priority, status) -> (priority) -> "
    "grand total, one hash-aggregate pass. grouping_id() disambiguates "
    "subtotal rows from real NULL groups.",
    tags=("aggregate", "rollup"),
)
def a_rollup_priority_status(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("sum_total"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "gid",
            "n_orders",
            "sum_total",
        )
    )


@register(
    "a_cube_priority_status",
    oracle=f"""
SELECT coalesce(o_orderpriority, 'ALL') AS priority,
       coalesce(o_orderstatus, 'ALL')  AS status,
       {_GID_SQL},
       count(*)::BIGINT AS n_orders,
       {dsum_sql('o_totalprice')} AS sum_total
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
""",
    doc="Full lattice: every subset of {priority, status} in one pass.",
    tags=("aggregate", "rollup"),
)
def a_cube_priority_status(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("sum_total"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "gid",
            "n_orders",
            "sum_total",
        )
    )


@register(
    "a_grouping_sets",
    oracle=f"""
SELECT coalesce(o_orderpriority, 'ALL') AS priority,
       coalesce(strftime(date_trunc('month', o_orderdate), '%Y-%m'), 'ALL') AS month,
       count(*)::BIGINT AS n_orders,
       {dsum_sql('o_totalprice')} AS sum_total
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (date_trunc('month', o_orderdate)))
""",
    doc="Explicit GROUPING SETS: per-priority totals and per-month "
    "totals from one scan (SQL face; Spark expands both sets in a "
    "single Expand + hash-aggregate).",
    tags=("aggregate", "rollup"),
)
def a_grouping_sets(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders_gs")
    return spark.sql(
        f"""
SELECT coalesce(o_orderpriority, 'ALL') AS priority,
       coalesce(date_format(date_trunc('month', o_orderdate), 'yyyy-MM'), 'ALL') AS month,
       count(*) AS n_orders,
       {dsum_sql('o_totalprice')} AS sum_total
FROM orders_gs
GROUP BY GROUPING SETS ((o_orderpriority), (date_trunc('month', o_orderdate)))
"""
    )


@register(
    "a_unpivot_measures",
    oracle=f"""
SELECT o_orderpriority, metric, value
FROM (
  SELECT o_orderpriority,
         count(*)::DOUBLE AS n_orders,
         {dsum_sql('o_totalprice')} AS sum_total,
         {davg_sql('o_totalprice')} AS avg_total
  FROM orders GROUP BY 1
) UNPIVOT (value FOR metric IN (n_orders, sum_total, avg_total))
""",
    doc="Wide->long reshape (melt): per-priority measure matrix "
    "unpivoted to (priority, metric, value) rows. Spark unpivot == "
    "DuckDB UNPIVOT.",
    tags=("aggregate", "reshape"),
)
def a_unpivot_measures(spark, sf_dir):
    from ..functions.exact import davg

    orders = load(spark, sf_dir, "orders")
    wide = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("double").alias("n_orders"),
        dsum("o_totalprice").alias("sum_total"),
        davg("o_totalprice").alias("avg_total"),
    )
    return wide.unpivot(
        ["o_orderpriority"], ["n_orders", "sum_total", "avg_total"],
        "metric", "value",
    )


@register(
    "a_mode_median",
    oracle="""
WITH cnt AS (
  SELECT o_orderstatus, o_orderpriority, count(*)::BIGINT AS n
  FROM orders GROUP BY 1, 2
),
mode_t AS (
  SELECT o_orderstatus, o_orderpriority AS mode_priority
  FROM cnt
  QUALIFY row_number() OVER (PARTITION BY o_orderstatus
                             ORDER BY n DESC, o_orderpriority) = 1
),
ranked AS (
  SELECT o_orderstatus, o_totalprice,
         row_number() OVER (PARTITION BY o_orderstatus
                            ORDER BY o_totalprice, o_orderkey) AS rn,
         count(*) OVER (PARTITION BY o_orderstatus) AS n
  FROM orders
),
med AS (
  SELECT o_orderstatus, avg(o_totalprice) AS median_total
  FROM ranked
  WHERE rn IN ((n + 1) // 2, (n + 2) // 2)
  GROUP BY 1
)
SELECT m.o_orderstatus AS status, m.mode_priority, d.median_total
FROM mode_t m JOIN med d USING (o_orderstatus)
""",
    doc="Exact mode (count argmax, deterministic tiebreak) and exact "
    "median (middle-element pick; even counts average the two middle "
    "doubles — a 2-value avg is order-insensitive, so no decimal dance "
    "needed) per order status. The median is DISTRIBUTED-exact: a "
    "full-partition rank window per status would drag every order "
    "through one reducer per status (3 reducers at 100 TB), so the "
    "selection runs as bucket counts (floor(price/10k), a monotone "
    "prefix of the ordering key) -> tiny cumulative offset table -> "
    "filter the fact to the 1-2 buckets containing the middle ranks "
    "-> rank WITHIN those buckets only + offset. Global ranks are "
    "identical to the single-window form; only the bucket rows are "
    "ever sorted (production sizes the bucket width from stats).",
    tags=("aggregate",),
)
def a_mode_median(spark, sf_dir):
    from pyspark.sql import Window

    orders = load(spark, sf_dir, "orders")
    cnt = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    mode_t = cnt.groupBy("o_orderstatus").agg(
        F.min_by(
            "o_orderpriority", F.struct(-F.col("n"), F.col("o_orderpriority"))
        ).alias("mode_priority")
    )
    fact = orders.select("o_orderstatus", "o_totalprice", "o_orderkey").withColumn(
        "mbkt", F.floor(F.col("o_totalprice") / 10000).cast("long")
    )
    bcnt = fact.groupBy("o_orderstatus", "mbkt").agg(F.count(F.lit(1)).alias("bn"))
    w_off = (
        Window.partitionBy("o_orderstatus")
        .orderBy("mbkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = bcnt.select(
        "o_orderstatus",
        "mbkt",
        "bn",
        F.coalesce(F.sum("bn").over(w_off), F.lit(0)).alias("boffset"),
        F.sum("bn").over(Window.partitionBy("o_orderstatus")).alias("n"),
    )
    sel = (
        off.withColumn("r1", F.expr("(n + 1) div 2"))
        .withColumn("r2", F.expr("(n + 2) div 2"))
        .filter(
            ((F.col("boffset") < F.col("r1")) & (F.col("r1") <= F.col("boffset") + F.col("bn")))
            | ((F.col("boffset") < F.col("r2")) & (F.col("r2") <= F.col("boffset") + F.col("bn")))
        )
        .select("o_orderstatus", "mbkt", "boffset", "r1", "r2")
    )
    w_loc = Window.partitionBy("o_orderstatus", "mbkt").orderBy(
        "o_totalprice", "o_orderkey"
    )
    ranked = fact.join(F.broadcast(sel), ["o_orderstatus", "mbkt"]).withColumn(
        "rng", F.row_number().over(w_loc) + F.col("boffset")
    )
    med = (
        ranked.filter((F.col("rng") == F.col("r1")) | (F.col("rng") == F.col("r2")))
        .groupBy("o_orderstatus")
        .agg(F.avg("o_totalprice").alias("median_total"))
    )
    return (
        mode_t.join(med, "o_orderstatus")
        .select(
            F.col("o_orderstatus").alias("status"), "mode_priority", "median_total"
        )
    )


N_BINS = 20


@register(
    "a_histogram_equiwidth",
    oracle=f"""
WITH b AS (
  SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders
)
SELECT least(floor(((o.o_totalprice - b.lo) / (b.hi - b.lo)) * {N_BINS}),
             {N_BINS - 1})::BIGINT AS bin,
       count(*)::BIGINT AS n_orders,
       {dsum_sql('o.o_totalprice')} AS bin_total
FROM orders o, b
GROUP BY 1
""",
    doc="Equal-width histogram over o_totalprice: pass 1 computes "
    "exact min/max (partial-agg, one row), which broadcasts back for "
    "a single binning scan — floor(((x-lo)/(hi-lo))*N) clamped to "
    "N-1. min/max and per-row IEEE arithmetic are order-insensitive, "
    "so bins are bit-exact across engines; only the per-bin totals "
    "need decimal summation. At 100 TB: two fact scans, each a "
    "map-side partial agg; the one-row bounds frame is a broadcast "
    "nested-loop of cardinality 1.",
    tags=("aggregate", "extension"),
)
def a_histogram_equiwidth(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    binned = orders.crossJoin(F.broadcast(bounds)).select(
        F.least(
            F.floor(
                ((F.col("o_totalprice") - F.col("lo")) / (F.col("hi") - F.col("lo")))
                * N_BINS
            ),
            F.lit(N_BINS - 1),
        ).alias("bin"),
        "o_totalprice",
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("bin_total"),
    )


@register(
    "a_exact_quantiles",
    oracle="""
WITH ranked AS (
  SELECT o_orderstatus, o_totalprice,
         row_number() OVER (PARTITION BY o_orderstatus
                            ORDER BY o_totalprice, o_orderkey) AS rn,
         count(*) OVER (PARTITION BY o_orderstatus) AS n
  FROM orders
)
SELECT o_orderstatus AS status,
       max(CASE WHEN rn = ((n - 1) * 1) // 4  + 1 THEN o_totalprice END) AS p25,
       max(CASE WHEN rn = ((n - 1) * 2) // 4  + 1 THEN o_totalprice END) AS p50,
       max(CASE WHEN rn = ((n - 1) * 3) // 4  + 1 THEN o_totalprice END) AS p75,
       max(CASE WHEN rn = ((n - 1) * 9) // 10 + 1 THEN o_totalprice END) AS p90
FROM ranked
GROUP BY o_orderstatus
""",
    doc="EXACT per-group quantiles (p25/p50/p75/p90 of order totals per "
    "status) via distributed rank selection "
    "(operators/quantiles.exact_group_quantiles): bucket counts on a "
    "monotone value transform locate each target rank, the fact "
    "filters to the few selected buckets, and only those rows are "
    "ever sorted — approx_percentile's sketches are engine- and "
    "merge-order-specific (never hash-checkable), and a naive rank "
    "window is one reducer per group. Lower-quantile element "
    "convention (single deterministic row, pure integer rank "
    "arithmetic). The oracle is the naive single-window form.",
    tags=("aggregate", "extension"),
)
def a_exact_quantiles(spark, sf_dir):
    from ..operators.quantiles import exact_group_quantiles

    orders = load(spark, sf_dir, "orders")
    out = exact_group_quantiles(
        orders,
        "o_orderstatus",
        "o_totalprice",
        "o_orderkey",
        [("p25", 1, 4), ("p50", 2, 4), ("p75", 3, 4), ("p90", 9, 10)],
        F.floor(F.col("o_totalprice") / 10000).cast("long"),
    )
    return out.withColumnRenamed("o_orderstatus", "status")


@register(
    "a_weighted_median",
    oracle="""
WITH ranked AS (
  SELECT l_returnflag, l_extendedprice,
         sum(l_quantity::BIGINT) OVER (
           PARTITION BY l_returnflag
           ORDER BY l_extendedprice, l_orderkey, l_linenumber
           ROWS UNBOUNDED PRECEDING)::BIGINT AS cw,
         sum(l_quantity::BIGINT) OVER (PARTITION BY l_returnflag)::BIGINT AS tw
  FROM lineitem
)
SELECT l_returnflag AS returnflag,
       min(l_extendedprice) AS weighted_median_price,
       min(tw)::BIGINT AS total_weight
FROM ranked
WHERE 2 * cw >= tw
GROUP BY l_returnflag
""",
    doc="Exact per-group WEIGHTED median (extended price weighted by "
    "quantity, per return flag — the lower weighted median: the "
    "smallest value whose cumulative weight reaches half the total). "
    "Same distributed rank-selection machinery as a_exact_quantiles, "
    "generalized from row counts to weight sums: per-bucket weight "
    "totals locate the single bucket where 2*cum crosses the total, "
    "the fact filters to that bucket, and only its rows get the "
    "cumulative window. Integer-valued weights keep every cumulative "
    "sum exact in both engines. The oracle is the naive "
    "single-window form.",
    tags=("aggregate", "extension"),
)
def a_weighted_median(spark, sf_dir):
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber",
        F.col("l_quantity").cast("long").alias("wt"),
    ).withColumn("wbkt", F.floor(F.col("l_extendedprice") / 5000).cast("long"))
    bcnt = li.groupBy("l_returnflag", "wbkt").agg(F.sum("wt").alias("bw"))
    w_off = (
        Window.partitionBy("l_returnflag")
        .orderBy("wbkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = bcnt.select(
        "l_returnflag",
        "wbkt",
        "bw",
        F.coalesce(F.sum("bw").over(w_off), F.lit(0)).alias("boffset"),
        F.sum("bw").over(Window.partitionBy("l_returnflag")).alias("tw"),
    )
    sel = off.filter(
        (2 * F.col("boffset") < F.col("tw"))
        & (2 * (F.col("boffset") + F.col("bw")) >= F.col("tw"))
    ).select("l_returnflag", "wbkt", "boffset", "tw")
    w_loc = (
        Window.partitionBy("l_returnflag", "wbkt")
        .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    picked = (
        li.join(F.broadcast(sel), ["l_returnflag", "wbkt"])
        .withColumn("cw", F.sum("wt").over(w_loc) + F.col("boffset"))
        .filter(2 * F.col("cw") >= F.col("tw"))
    )
    return picked.groupBy(F.col("l_returnflag").alias("returnflag")).agg(
        F.min("l_extendedprice").alias("weighted_median_price"),
        F.min("tw").cast("long").alias("total_weight"),
    )


@register(
    "a_histogram_equidepth",
    # Equi-depth (equi-height) histogram — the per-column statistic a
    # cost-based optimizer keeps. Bucket BOUNDS are the exact k/8
    # quantiles (distributed rank selection, the a_exact_quantiles
    # machinery); every row lands in the first bucket whose bound
    # covers its value, else the last. Ties at a bound legitimately
    # skew populations toward the lower bucket — that is the real
    # semantics of value-bounded buckets (unlike ntile's rank split).
    # The oracle mirrors the construction with the naive rank window.
    oracle="""
WITH ranked AS (
  SELECT o_orderstatus, o_totalprice,
         row_number() OVER (PARTITION BY o_orderstatus
                            ORDER BY o_totalprice, o_orderkey) AS rn,
         count(*) OVER (PARTITION BY o_orderstatus) AS n
  FROM orders
),
bounds AS (
  SELECT o_orderstatus, b,
         max(CASE WHEN rn = ((n - 1) * b) // 8 + 1 THEN o_totalprice END) AS ub
  FROM ranked, unnest(generate_series(1, 7)) t(b)
  GROUP BY 1, 2
),
assigned AS (
  SELECT o.o_orderstatus, o.o_orderkey,
         coalesce(min(CASE WHEN o.o_totalprice <= bo.ub THEN bo.b END), 8) AS bucket
  FROM orders o JOIN bounds bo USING (o_orderstatus)
  GROUP BY 1, 2
)
SELECT o_orderstatus AS status, bucket::INT AS bucket, count(*)::BIGINT AS n_rows
FROM assigned GROUP BY 1, 2
""",
    doc="Equi-depth histogram per group: 8 value-bounded buckets whose "
    "bounds are the exact k/8 quantiles (distributed rank selection, "
    "no global sort) — the CBO column statistic, next to the "
    "equi-WIDTH histogram (a_histogram_equiwidth). Bounds broadcast; "
    "assignment is a chained comparison in codegen; one count "
    "shuffle.",
    tags=("aggregate", "extension"),
)
def a_histogram_equidepth(spark, sf_dir):
    from ..operators.quantiles import exact_group_quantiles

    orders = load(spark, sf_dir, "orders")
    probs = [(f"b{k}", k, 8) for k in range(1, 8)]
    bounds = exact_group_quantiles(
        orders, "o_orderstatus", "o_totalprice", "o_orderkey", probs,
        F.floor(F.col("o_totalprice") / 10000).cast("long"),
    )
    j = orders.select("o_orderstatus", "o_totalprice").join(
        F.broadcast(bounds), "o_orderstatus"
    )
    bucket = None
    for k in range(1, 8):
        cond = F.col("o_totalprice") <= F.col(f"b{k}")
        bucket = F.when(cond, k) if bucket is None else bucket.when(cond, k)
    bucket = bucket.otherwise(8)
    return (
        j.groupBy(F.col("o_orderstatus").alias("status"), bucket.cast("int").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


# --- a_corr_matrix -------------------------------------------------
# Pearson correlation from exact decimal moments. Engine-native corr()
# is a streaming Welford merge whose low bits depend on partial-agg
# order, so instead both engines compute the five moments through the
# dsum staging (order-free exact decimal sums of bit-identical per-row
# doubles) and then evaluate the closed-form
#   (n*Sxy - Sx*Sy) / (sqrt(n*Sxx - Sx^2) * sqrt(n*Syy - Sy^2))
# with textually identical double arithmetic: +,-,*,/,sqrt are IEEE
# correctly-rounded in both engines, so the result is bit-exact AND
# run-to-run reproducible on a 1000-executor cluster (engine corr()
# is not). Price is pre-scaled by 1e5 (corr is scale-invariant) to
# keep the squared-sum magnitude inside dsum's 2^53/1e4 validity bound
# at 100 TB row counts.
_CORR_COLS = {
    "q": ("quantity", "l_quantity::DOUBLE"),
    "p": ("price", "l_extendedprice / 100000::DOUBLE"),
    "d": ("discount", "l_discount::DOUBLE"),
    "t": ("tax", "l_tax::DOUBLE"),
}
_CORR_PAIRS = [("q", "p"), ("q", "d"), ("q", "t"), ("p", "d"), ("p", "t"), ("d", "t")]


def _corr_formula(a: str, b: str) -> str:
    return (
        f"(n * sp_{a}{b} - s_{a} * s_{b}) / "
        f"(sqrt(n * ss_{a} - s_{a} * s_{a}) * sqrt(n * ss_{b} - s_{b} * s_{b}))"
    )


_CORR_ORACLE = (
    "WITH m AS (\n  SELECT count(*)::DOUBLE AS n,\n"
    + ",\n".join(
        f"    {dsum_sql(expr)} AS s_{k},\n"
        f"    {dsum_sql(f'({expr}) * ({expr})')} AS ss_{k}"
        for k, (_, expr) in _CORR_COLS.items()
    )
    + ",\n"
    + ",\n".join(
        f"    {dsum_sql(f'({_CORR_COLS[a][1]}) * ({_CORR_COLS[b][1]})')} AS sp_{a}{b}"
        for a, b in _CORR_PAIRS
    )
    + "\n  FROM lineitem\n)\n"
    + "\nUNION ALL\n".join(
        f"SELECT '{_CORR_COLS[a][0]}~{_CORR_COLS[b][0]}' AS pair, "
        f"{_corr_formula(a, b)} AS corr FROM m"
        for a, b in _CORR_PAIRS
    )
)


@register(
    "a_corr_matrix",
    oracle=_CORR_ORACLE,
    doc="Pairwise Pearson correlation matrix over the lineitem "
    "measures, computed from exact decimal moments (one aggregate-only "
    "pass, map-side partials, 1-row reduce) then a closed-form double "
    "evaluation identical in both engines — deterministic at any "
    "cluster size, unlike streaming corr(). Scan reads 4 columns.",
    tags=("aggregate", "extension", "stats"),
)
def a_corr_matrix(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    x = li.select(
        F.col("l_quantity").cast("double").alias("q"),
        (F.col("l_extendedprice") / F.lit(100000.0)).alias("p"),
        F.col("l_discount").cast("double").alias("d"),
        F.col("l_tax").cast("double").alias("t"),
    )
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for k in _CORR_COLS:
        aggs.append(dsum(F.col(k)).alias(f"s_{k}"))
        aggs.append(dsum(F.col(k) * F.col(k)).alias(f"ss_{k}"))
    for a, b in _CORR_PAIRS:
        aggs.append(dsum(F.col(a) * F.col(b)).alias(f"sp_{a}{b}"))
    m = x.agg(*aggs)
    stack_args = ", ".join(
        f"'{_CORR_COLS[a][0]}~{_CORR_COLS[b][0]}', {_corr_formula(a, b)}"
        for a, b in _CORR_PAIRS
    )
    return m.selectExpr(f"stack(6, {stack_args}) AS (pair, corr)")


@register(
    "a_iqr_outliers",
    # Tukey-fence robust outlier report per event type: exact
    # p25/p75 from distributed rank selection, fences at
    # p25 - 1.5*IQR / p75 + 1.5*IQR, then one broadcast join back to
    # count rows outside the fences. 1.5 is cast to DOUBLE in the
    # oracle (bare 1.5 parses as DECIMAL and changes the arithmetic);
    # the fence expressions evaluate in the same order in both
    # engines, so classification at the boundary is bit-identical.
    oracle="""
WITH ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
q AS (
  SELECT event_type,
         max(CASE WHEN rn = ((n - 1) * 1) // 4 + 1 THEN value END) AS p25,
         max(CASE WHEN rn = ((n - 1) * 3) // 4 + 1 THEN value END) AS p75
  FROM ranked GROUP BY event_type
),
f AS (
  SELECT event_type, p25, p75,
         p25 - 1.5::DOUBLE * (p75 - p25) AS lo_fence,
         p75 + 1.5::DOUBLE * (p75 - p25) AS hi_fence
  FROM q
)
SELECT e.event_type, f.p25, f.p75, f.lo_fence, f.hi_fence,
       sum(CASE WHEN e.value < f.lo_fence THEN 1 ELSE 0 END)::BIGINT AS n_below,
       sum(CASE WHEN e.value > f.hi_fence THEN 1 ELSE 0 END)::BIGINT AS n_above,
       count(*)::BIGINT AS n_total
FROM events e JOIN f ON e.event_type = f.event_type
GROUP BY 1, 2, 3, 4, 5
""",
    doc="Robust outlier detection (Tukey fences on exact quartiles "
    "of event value per type — the long-tailed column, so the report "
    "is non-vacuous): the data-cleaning pass that precedes any "
    "aggregate modeling. Quartiles come from the bucketed "
    "rank-selection operator (never a one-reducer-per-group window), "
    "the fences table is |event types| rows and broadcasts, and the "
    "fact scans once more "
    "for the fence comparison — two fact scans total, both "
    "column-pruned, no corpus-sized sort at any step.",
    tags=("aggregate", "stats", "extension"),
)
def a_iqr_outliers(spark, sf_dir):
    from ..operators.quantiles import exact_group_quantiles

    ev = load(spark, sf_dir, "events")
    q = exact_group_quantiles(
        ev,
        "event_type",
        "value",
        "event_id",
        [("p25", 1, 4), ("p75", 3, 4)],
        F.floor(F.col("value") / 10).cast("long"),
    )
    iqr = F.col("p75") - F.col("p25")
    fences = q.select(
        "event_type",
        "p25",
        "p75",
        (F.col("p25") - F.lit(1.5) * iqr).alias("lo_fence"),
        (F.col("p75") + F.lit(1.5) * iqr).alias("hi_fence"),
    )
    return (
        ev.select("event_type", "value")
        .join(F.broadcast(fences), "event_type")
        .groupBy("event_type", "p25", "p75", "lo_fence", "hi_fence")
        .agg(
            F.sum(
                F.when(F.col("value") < F.col("lo_fence"), 1).otherwise(0)
            ).cast("long").alias("n_below"),
            F.sum(
                F.when(F.col("value") > F.col("hi_fence"), 1).otherwise(0)
            ).cast("long").alias("n_above"),
            F.count(F.lit(1)).alias("n_total"),
        )
    )


@register(
    "a_ks_two_sample",
    # Two-sample Kolmogorov-Smirnov statistic between the click and
    # purchase value distributions: D = max over value levels of
    # |F_a(v) - F_b(v)|, plus the level where the max occurs (ties ->
    # smallest level). Everything before the final division is
    # integer (per-level counts and cumulative sums), the two CDF
    # fractions are single IEEE divisions, and |.| / max / the
    # (D DESC, v) argmax chain are order-deterministic — bit-exact
    # across engines.
    oracle="""
WITH a AS (SELECT value AS v, count(*)::BIGINT AS c FROM events
           WHERE event_type = 'click' GROUP BY 1),
b AS (SELECT value AS v, count(*)::BIGINT AS c FROM events
      WHERE event_type = 'purchase' GROUP BY 1),
lv AS (
  SELECT coalesce(a.v, b.v) AS v, coalesce(a.c, 0) AS ca, coalesce(b.c, 0) AS cb
  FROM a FULL JOIN b ON a.v = b.v
),
tot AS (SELECT sum(ca)::BIGINT AS n_a, sum(cb)::BIGINT AS n_b FROM lv),
cum AS (
  SELECT v,
         sum(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)::BIGINT AS cca,
         sum(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)::BIGINT AS ccb
  FROM lv
)
SELECT tot.n_a, tot.n_b,
       abs(cum.cca::DOUBLE / tot.n_a - cum.ccb::DOUBLE / tot.n_b) AS ks_d,
       cum.v AS at_value
FROM cum, tot
ORDER BY ks_d DESC, at_value
LIMIT 1
""",
    doc="Two-sample KS test (drift detection between cohorts / data "
    "versions). Spark plan avoids the oracle's global-order window: "
    "value levels bucket by floor(v), per-bucket totals prefix-sum "
    "over the tiny bucket table (broadcast back), and the in-bucket "
    "cumulative runs per bucket — the two-level prefix-sum shape, so "
    "no single-reducer CDF at 100 TB; the argmax is a TakeOrdered, "
    "not a global sort.",
    tags=("aggregate", "stats", "extension"),
)
def a_ks_two_sample(spark, sf_dir):
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    a = (
        ev.filter(F.col("event_type") == "click")
        .groupBy(F.col("value").alias("v"))
        .agg(F.count(F.lit(1)).alias("ca"))
    )
    b = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("value").alias("v"))
        .agg(F.count(F.lit(1)).alias("cb"))
    )
    lv = (
        a.join(b, "v", "full")
        .select(
            "v",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
            F.floor("v").alias("bkt"),
        )
    )
    tot = lv.agg(
        F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b")
    )
    # two-level prefix sum: bucket totals -> offsets over the tiny
    # bucket table, then the per-bucket local cumulative + offset.
    # Exact because floor(v) is a PREFIX of the (v) ordering.
    bt = lv.groupBy("bkt").agg(
        F.sum("ca").alias("ba"), F.sum("cb").alias("bb")
    )
    w_b = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    off = bt.select(
        "bkt",
        F.coalesce(F.sum("ba").over(w_b), F.lit(0)).alias("off_a"),
        F.coalesce(F.sum("bb").over(w_b), F.lit(0)).alias("off_b"),
    )
    w_l = (
        Window.partitionBy("bkt")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        lv.join(F.broadcast(off), "bkt")
        .select(
            "v",
            (F.col("off_a") + F.sum("ca").over(w_l)).alias("cca"),
            (F.col("off_b") + F.sum("cb").over(w_l)).alias("ccb"),
        )
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            "n_a",
            "n_b",
            F.abs(
                F.col("cca").cast("double") / F.col("n_a")
                - F.col("ccb").cast("double") / F.col("n_b")
            ).alias("ks_d"),
            F.col("v").alias("at_value"),
        )
        .orderBy(F.col("ks_d").desc(), "at_value")
        .limit(1)
    )


@register(
    "a_mad_robust_z",
    # Median-absolute-deviation anomaly report per event type: the
    # robust-z counterpart to the Tukey fences (a_iqr_outliers). MAD =
    # median(|x - median(x)|); a point is anomalous when
    # 0.6745 * |x - med| / mad > 3.5 (the Iglewicz-Hoaglin modified
    # z-score rule), rearranged MULTIPLICATION-ONLY as
    # 0.6745 * |x - med| > 3.5 * mad so both engines evaluate two
    # exact products and one comparison — no division rounding at the
    # decision boundary. Medians come from the distributed
    # rank-selection operator, lower-element convention, both stages.
    oracle="""
WITH r1 AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
med AS (
  SELECT event_type,
         max(CASE WHEN rn = ((n - 1) * 1) // 2 + 1 THEN value END) AS med
  FROM r1 GROUP BY event_type
),
dev AS (
  SELECT e.event_type, e.value, abs(e.value - m.med) AS d, m.med, e.event_id
  FROM events e JOIN med m ON e.event_type = m.event_type
),
r2 AS (
  SELECT event_type, d, med,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY d, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM dev
),
mad AS (
  SELECT event_type, any_value(med) AS med,
         max(CASE WHEN rn = ((n - 1) * 1) // 2 + 1 THEN d END) AS mad
  FROM r2 GROUP BY event_type
)
SELECT d.event_type, m.med, m.mad,
       sum(CASE WHEN 0.6745::DOUBLE * d.d > 3.5::DOUBLE * m.mad
                THEN 1 ELSE 0 END)::BIGINT AS n_anomalies,
       count(*)::BIGINT AS n_total
FROM dev d JOIN mad m ON d.event_type = m.event_type
GROUP BY 1, 2, 3
""",
    doc="Robust anomaly detection via MAD modified z-scores per event "
    "type. Two rank-selection median passes (bucketed, never a "
    "one-reducer-per-group window), the 5-row med/mad table broadcasts "
    "back, and the anomaly rule is rearranged multiplication-only so "
    "the boundary comparison is bit-identical across engines. Two "
    "column-pruned fact scans per pass — the shape survives 100 TB.",
    tags=("aggregate", "stats", "extension"),
)
def a_mad_robust_z(spark, sf_dir):
    from ..operators.quantiles import exact_group_quantiles

    ev = load(spark, sf_dir, "events")
    med = exact_group_quantiles(
        ev,
        "event_type",
        "value",
        "event_id",
        [("med", 1, 2)],
        F.floor(F.col("value") / 10).cast("long"),
    )
    # lineage cut: dev feeds the second rank-selection pass (bucket
    # counts + selected-bucket filter) AND the final fence aggregate —
    # without it each consumer re-pays the scan + broadcast join
    # (profiled 2.7 s -> ~1.5 s at sf0.01)
    dev = (
        ev.select("event_type", "value", "event_id")
        .join(F.broadcast(med), "event_type")
        .select(
            "event_type",
            "value",
            "event_id",
            "med",
            F.abs(F.col("value") - F.col("med")).alias("d"),
        )
        .transform(lineage_cut_lazy)
    )
    mad = exact_group_quantiles(
        dev,
        "event_type",
        "d",
        "event_id",
        [("mad", 1, 2)],
        F.floor(F.col("d") / 10).cast("long"),
    ).withColumnRenamed("mad", "mad_v")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med", F.col("mad_v").alias("mad"))
        .agg(
            F.sum(
                F.when(
                    F.lit(0.6745) * F.col("d") > F.lit(3.5) * F.col("mad_v"), 1
                ).otherwise(0)
            ).cast("long").alias("n_anomalies"),
            F.count(F.lit(1)).alias("n_total"),
        )
    )


@register(
    "a_benford_digits",
    # Benford first-digit analysis of order totals (the
    # fabricated-numbers screen): observed first-digit frequencies vs
    # the Benford expectation log10(1 + 1/d), with per-digit
    # chi-square terms and the total. First digit comes from the
    # INTEGER part's string form (floor -> BIGINT -> first char), not
    # log10-of-the-value — integers stringify identically in both
    # engines while log10 at a power-of-ten boundary is 1-ulp
    # ambiguous. The 9 expectation logs are quantized at 7 dp; sums
    # run through exact decimal.
    oracle="""
WITH d AS (
  SELECT substr(floor(o_totalprice)::BIGINT::VARCHAR, 1, 1)::INT AS digit,
         count(*)::BIGINT AS n_obs
  FROM orders GROUP BY 1
),
t AS (SELECT sum(n_obs)::BIGINT AS n FROM d),
e AS (
  SELECT digit, n_obs, n,
         n_obs::DOUBLE / n AS obs_frac,
         printf('%.7f', log10(1 + 1::DOUBLE / digit))::DOUBLE AS exp_frac
  FROM d, t
),
c AS (
  SELECT digit, n_obs, obs_frac, exp_frac,
         n * (obs_frac - exp_frac) * (obs_frac - exp_frac) / exp_frac AS chi2_term
  FROM e
)
SELECT digit, n_obs, obs_frac, exp_frac, chi2_term,
       round(sum((chi2_term)::DECIMAL(30,10)) OVER (), 4)::DOUBLE AS chi2_total
FROM c
""",
    doc="Benford's-law conformance of order totals: digit histogram "
    "(one 9-key aggregate with map-side partials), broadcast total, "
    "per-digit chi-square terms in identical-order double arithmetic, "
    "and the exact-decimal chi-square total over the 9-row frame. "
    "The screen auditors run before trusting a ledger; one "
    "column-pruned scan.",
    tags=("aggregate", "stats", "extension"),
)
def a_benford_digits(spark, sf_dir):
    from pyspark.sql import Window

    from ..functions.exact import dsum_over

    orders = load(spark, sf_dir, "orders")
    d = (
        orders.select(
            F.substring(
                F.floor("o_totalprice").cast("long").cast("string"), 1, 1
            )
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    t = d.agg(F.sum("n_obs").alias("n"))
    e = d.crossJoin(F.broadcast(t)).select(
        "digit",
        "n_obs",
        "n",
        (F.col("n_obs").cast("double") / F.col("n")).alias("obs_frac"),
        F.format_string("%.7f", F.log10(F.lit(1) + F.lit(1.0) / F.col("digit")))
        .cast("double")
        .alias("exp_frac"),
    )
    c = e.select(
        "digit",
        "n_obs",
        "obs_frac",
        "exp_frac",
        (
            F.col("n")
            * (F.col("obs_frac") - F.col("exp_frac"))
            * (F.col("obs_frac") - F.col("exp_frac"))
            / F.col("exp_frac")
        ).alias("chi2_term"),
    )
    return c.select(
        "*", dsum_over("chi2_term", Window.partitionBy()).alias("chi2_total")
    )


@register(
    "a_chi2_independence",
    # Chi-square test of independence between event type and ISO
    # weekday: observed contingency counts vs the margin-product
    # expectation, chi2 = sum (o - e)^2 / e over the 35 cells. All
    # integers until e = (row_total * col_total) / n — one division —
    # and the per-cell terms sum through exact decimal. The
    # association screen behind "does activity mix shift by weekday".
    oracle=f"""
WITH o AS (
  SELECT event_type, isodow(ts)::INT AS dow, count(*)::BIGINT AS obs
  FROM events GROUP BY 1, 2
),
m AS (
  SELECT o.event_type, o.dow, o.obs,
         sum(o.obs) OVER (PARTITION BY o.event_type)::BIGINT AS row_n,
         sum(o.obs) OVER (PARTITION BY o.dow)::BIGINT AS col_n,
         sum(o.obs) OVER ()::BIGINT AS n
  FROM o
),
c AS (
  SELECT event_type, dow, obs,
         (row_n * col_n)::DOUBLE / n AS expected
  FROM m
),
t AS (
  SELECT event_type, dow, obs, expected,
         (obs - expected) * (obs - expected) / expected AS term
  FROM c
)
SELECT event_type, dow, obs, expected,
       round(sum((term)::DECIMAL(30,10)) OVER (), 4)::DOUBLE AS chi2_total
FROM t
""",
    doc="Type x weekday independence test: the 35-cell contingency "
    "table aggregates with map-side partials (the only fact-sized "
    "stage); margins and the chi-square run as windows over the tiny "
    "cell table. Deterministic: exact counts, one division per cell, "
    "exact-decimal total.",
    tags=("aggregate", "stats", "extension"),
)
def a_chi2_independence(spark, sf_dir):
    from pyspark.sql import Window

    from ..functions.exact import dsum_over

    ev = load(spark, sf_dir, "events")
    o = ev.groupBy(
        "event_type",
        ((F.dayofweek("ts") + 5) % 7 + 1).cast("int").alias("dow"),
    ).agg(F.count(F.lit(1)).alias("obs"))
    m = o.select(
        "event_type",
        "dow",
        "obs",
        F.sum("obs").over(Window.partitionBy("event_type")).alias("row_n"),
        F.sum("obs").over(Window.partitionBy("dow")).alias("col_n"),
        F.sum("obs").over(Window.partitionBy()).alias("n"),
    )
    c = m.select(
        "event_type",
        "dow",
        "obs",
        ((F.col("row_n") * F.col("col_n")).cast("double") / F.col("n")).alias(
            "expected"
        ),
    )
    t = c.select(
        "event_type",
        "dow",
        "obs",
        "expected",
        (
            (F.col("obs") - F.col("expected"))
            * (F.col("obs") - F.col("expected"))
            / F.col("expected")
        ).alias("term"),
    )
    return t.select(
        "event_type",
        "dow",
        "obs",
        "expected",
        dsum_over("term", Window.partitionBy()).alias("chi2_total"),
    )


@register(
    "a_skyline_2d",
    # Dominance rule (maximize price, minimize date): A dominates B
    # iff price_A >= price_B AND date_A <= date_B with one strict;
    # equal (price, date) points do not dominate each other. The
    # single-pass formulation below is equivalent to NOT EXISTS
    # dominator (proof pinned brute-force in tests/test_skyline.py):
    # a row survives iff its date equals the min date AT its price and
    # beats the min date over all strictly higher prices.
    oracle="""
WITH pts AS (
  SELECT o_orderkey, o_totalprice AS x, o_orderdate AS y FROM orders
),
gx AS (SELECT x, min(y) AS gmin FROM pts GROUP BY x),
h AS (
  SELECT x, gmin,
         min(gmin) OVER (ORDER BY x DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS hmin
  FROM gx
)
SELECT p.o_orderkey, p.x AS o_totalprice,
       strftime(p.y, '%Y-%m-%d') AS o_orderdate
FROM pts p JOIN h ON p.x = h.x
WHERE p.y = h.gmin AND (h.hmin IS NULL OR p.y < h.hmin)
""",
    doc="2-D skyline (Pareto front): the orders no other order beats "
    "on BOTH price (higher) and date (earlier) — multi-criteria "
    "shortlisting without a scoring function. Plan: one groupBy(price) "
    "shuffle, then the x_data_mixture two-level trick for the "
    "running min over strictly-higher prices — per-price-bucket mins "
    "form a tiny table whose exclusive prefix-min broadcasts back, and "
    "the within-bucket window partitions by bucket (distinct prices "
    "per row, so the ROWS frame is exact) — no un-partitioned window "
    "over the fact at any size. The oracle states the same skyline as "
    "one global window; tests/test_skyline.py proves both equal the "
    "quadratic NOT-EXISTS dominance definition.",
    tags=("aggregates", "window", "extension"),
)
def a_skyline_2d(spark, sf_dir):
    from pyspark.sql import Window

    pts = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").alias("x"),
        F.col("o_orderdate").alias("y"),
    )
    gx = pts.groupBy("x").agg(F.min("y").alias("gmin")).withColumn(
        "xb", F.floor(F.col("x") / F.lit(4096.0))
    )
    bkt = gx.groupBy("xb").agg(F.min("gmin").alias("bmin"))
    w_hi = Window.orderBy(F.col("xb").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    boff = bkt.select("xb", F.min("bmin").over(w_hi).alias("hb"))
    w_in = Window.partitionBy("xb").orderBy(F.col("x").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    h = (
        gx.join(F.broadcast(boff), "xb")
        .withColumn("hin", F.min("gmin").over(w_in))
        # Spark least() skips nulls, so this is min-over-present
        .withColumn("hmin", F.least("hb", "hin"))
        .select("x", "gmin", "hmin")
    )
    return (
        pts.join(h, "x")
        .filter(
            (F.col("y") == F.col("gmin"))
            & (F.col("hmin").isNull() | (F.col("y") < F.col("hmin")))
        )
        .select(
            "o_orderkey",
            F.col("x").alias("o_totalprice"),
            F.date_format("y", "yyyy-MM-dd").alias("o_orderdate"),
        )
    )


KMV_K = 256
_HEX12 = float(16 ** 12)  # hash space for the 12-hex-digit KMV hash


@register(
    "a_kmv_distinct_sketch",
    # KMV (k-minimum-values) distinct sketch, made exactly
    # reproducible: hashes are the first 12 md5 hex digits (uniform,
    # engine-identical), so the k-th smallest hash — and therefore the
    # estimate (k-1) * 16^12 / h_k — is deterministic, unlike HLL
    # whose register layout differs per engine. (k-1)*16^12 is a
    # single exact double multiply (255 * 2^48 needs 8 mantissa bits);
    # the divide is one IEEE op. Sources with fewer than k distinct
    # tokens fall back to the exact count (the sketch holds every
    # value). Mergeable: union of per-shard KMV sets -> k smallest.
    oracle=f"""
WITH toks AS (
  SELECT DISTINCT source, tok FROM (
    SELECT source, a[i - 1] || ' ' || a[i] AS tok
    FROM (SELECT source, string_split(lower(text), ' ') AS a FROM documents),
         LATERAL unnest(generate_series(2, len(a))) t(i)
    WHERE a[i - 1] <> '' AND a[i] <> ''
  )
),
h AS (
  SELECT source, tok, ('0x' || substr(md5(tok), 1, 12))::BIGINT AS hv
  FROM toks
),
ranked AS (
  SELECT source, hv,
         row_number() OVER (PARTITION BY source ORDER BY hv, tok) AS rn,
         count(*) OVER (PARTITION BY source) AS n_exact
  FROM h
),
kth AS (SELECT source, hv AS hk, n_exact FROM ranked WHERE rn = {KMV_K}),
base AS (SELECT source, max(n_exact)::BIGINT AS n_exact FROM ranked GROUP BY 1)
SELECT b.source, b.n_exact,
       coalesce(({KMV_K} - 1)::DOUBLE * {_HEX12!r} / k.hk,
                b.n_exact::DOUBLE) AS kmv_est,
       abs(coalesce(({KMV_K} - 1)::DOUBLE * {_HEX12!r} / k.hk,
                    b.n_exact::DOUBLE) - b.n_exact) / b.n_exact AS rel_err
FROM base b LEFT JOIN kth k USING (source)
""",
    doc="Per-source distinct-bigram estimate via a KMV sketch vs the "
    "exact count, with relative error — the mergeable-sketch pattern "
    "(union shards, keep k smallest hashes) that replaces exact "
    "count-distinct at 100 TB, here with a deterministic md5 hash "
    "family so both engines compute the identical estimate. Per-group "
    "rank <= k compiles to WindowGroupLimit (per-partition top-k "
    "before the exchange), so the sketch build never sorts a group "
    "through one reducer.",
    tags=("aggregates", "stats", "extension"),
)
def a_kmv_distinct_sketch(spark, sf_dir):
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    toks = (
        docs.select("source", F.split(F.lower("text"), " ").alias("a"))
        .select(
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(2, size(a)), i -> "
                    "struct(a[i - 2] AS w1, a[i - 1] AS w2))"
                )
            ).alias("p"),
        )
        .filter((F.col("p.w1") != "") & (F.col("p.w2") != ""))
        .select("source", F.concat_ws(" ", "p.w1", "p.w2").alias("tok"))
        .distinct()
    )
    h = toks.withColumn(
        "hv",
        F.expr("cast(conv(substring(md5(tok), 1, 12), 16, 10) as bigint)"),
    )
    w = Window.partitionBy("source").orderBy("hv", "tok")
    ranked = h.withColumn("rn", F.row_number().over(w))
    base = h.groupBy("source").agg(F.count(F.lit(1)).alias("n_exact"))
    kth = ranked.filter(F.col("rn") == KMV_K).select("source", F.col("hv").alias("hk"))
    est = F.coalesce(
        F.lit(float(KMV_K - 1)) * F.lit(_HEX12) / F.col("hk").cast("double"),
        F.col("n_exact").cast("double"),
    )
    return base.join(F.broadcast(kth), "source", "left").select(
        "source",
        "n_exact",
        est.alias("kmv_est"),
        (F.abs(est - F.col("n_exact")) / F.col("n_exact")).alias("rel_err"),
    )


KMVS_K = 128  # sketch size for the set-operation estimates


@register(
    "a_kmv_set_ops",
    # KMV sketch ALGEBRA (Beyer et al. 2007): two per-source sketches
    # merge into the union's sketch by keeping the k smallest of the
    # combined hash sets — so |A u B| and Jaccard(A, B) come from
    # kilobyte sketches instead of re-scanning either corpus. Estimates:
    # |A u B| ~ (k-1) * H / h_k(union), J(A,B) ~ |top-k(union) hashes
    # present in BOTH sketches| / k. Every hash is the deterministic
    # 12-hex md5 prefix, ranks ride unique (hv, tok) chains, and the
    # estimates are single IEEE divisions — engine-identical. The
    # exact pair overlap is computed alongside as the eval baseline.
    oracle=f"""
WITH toks AS (
  SELECT DISTINCT source, tok FROM (
    SELECT source, a[i - 1] || ' ' || a[i] AS tok
    FROM (SELECT source, string_split(lower(text), ' ') AS a FROM documents),
         LATERAL unnest(generate_series(2, len(a))) t(i)
    WHERE a[i - 1] <> '' AND a[i] <> ''
  )
),
h AS (
  SELECT source, tok, ('0x' || substr(md5(tok), 1, 12))::BIGINT AS hv
  FROM toks
),
sk AS (
  SELECT source, hv FROM (
    SELECT source, hv,
           row_number() OVER (PARTITION BY source ORDER BY hv, tok) AS rn
    FROM h
  ) WHERE rn <= {KMVS_K}
),
srcs AS (SELECT DISTINCT source FROM documents),
u AS (
  SELECT p.sa, p.sb, x.hv,
         max(CASE WHEN x.source = p.sa THEN 1 ELSE 0 END) AS in_a,
         max(CASE WHEN x.source = p.sb THEN 1 ELSE 0 END) AS in_b
  FROM (SELECT a.source AS sa, b.source AS sb
        FROM srcs a JOIN srcs b ON a.source < b.source) p
  JOIN sk x ON x.source IN (p.sa, p.sb)
  GROUP BY p.sa, p.sb, x.hv
),
ranked AS (
  SELECT sa, sb, hv, in_a, in_b,
         row_number() OVER (PARTITION BY sa, sb ORDER BY hv) AS rn,
         count(*) OVER (PARTITION BY sa, sb) AS n_u
  FROM u
),
est AS (
  SELECT sa, sb,
         min(CASE WHEN rn = {KMVS_K} THEN hv END) AS hk,
         max(n_u)::BIGINT AS n_sketch_union,
         sum(CASE WHEN rn <= {KMVS_K} AND in_a = 1 AND in_b = 1
                  THEN 1 ELSE 0 END)::BIGINT AS n_both_topk
  FROM ranked GROUP BY sa, sb
),
ex AS (
  SELECT a.source AS sa, b.source AS sb, count(*)::BIGINT AS n_inter
  FROM toks a JOIN toks b ON a.tok = b.tok AND a.source < b.source
  GROUP BY 1, 2
),
sizes AS (SELECT source, count(*)::BIGINT AS n FROM toks GROUP BY 1)
SELECT e.sa AS src_a, e.sb AS src_b,
       (za.n + zb.n - coalesce(x.n_inter, 0))::BIGINT AS union_exact,
       coalesce(({KMVS_K} - 1)::DOUBLE * {_HEX12!r} / e.hk,
                e.n_sketch_union::DOUBLE) AS union_est,
       abs(coalesce(({KMVS_K} - 1)::DOUBLE * {_HEX12!r} / e.hk,
                    e.n_sketch_union::DOUBLE)
           - (za.n + zb.n - coalesce(x.n_inter, 0)))
         / (za.n + zb.n - coalesce(x.n_inter, 0)) AS union_rel_err,
       coalesce(x.n_inter, 0)::DOUBLE
         / (za.n + zb.n - coalesce(x.n_inter, 0)) AS jaccard_exact,
       e.n_both_topk::DOUBLE / {KMVS_K} AS jaccard_est
FROM est e
LEFT JOIN ex x ON x.sa = e.sa AND x.sb = e.sb
JOIN sizes za ON za.source = e.sa
JOIN sizes zb ON zb.source = e.sb
""",
    doc="Set operations on KMV sketches: per-source 128-value sketches "
    "of the distinct-bigram sets merge pairwise into union sketches, "
    "giving |A u B| and Jaccard estimates for every source pair from "
    "O(k) state — the sketch-algebra pattern that answers 190 "
    "pairwise overlap questions at 100 TB without 190 corpus joins. "
    "Sketch build is a per-source WindowGroupLimit top-k; the pair "
    "stage runs entirely on the kilobyte sketch table. Exact "
    "union/Jaccard computed alongside as the error baseline.",
    tags=("aggregates", "stats", "extension"),
)
def a_kmv_set_ops(spark, sf_dir):
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    toks = (
        docs.select("source", F.split(F.lower("text"), " ").alias("a"))
        .select(
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(2, size(a)), i -> "
                    "struct(a[i - 2] AS w1, a[i - 1] AS w2))"
                )
            ).alias("p"),
        )
        .filter((F.col("p.w1") != "") & (F.col("p.w2") != ""))
        .select("source", F.concat_ws(" ", "p.w1", "p.w2").alias("tok"))
        .distinct()
        .transform(lineage_cut_lazy)  # consumed by sketch + exact sides
    )
    h = toks.select(
        "source",
        "tok",
        F.expr("cast(conv(substring(md5(tok), 1, 12), 16, 10) as bigint)").alias(
            "hv"
        ),
    )
    w_src = Window.partitionBy("source").orderBy("hv", "tok")
    sk = (
        h.withColumn("rn", F.row_number().over(w_src))
        .filter(F.col("rn") <= KMVS_K)
        .select("source", "hv")
    )
    srcs = docs.select("source").distinct()
    pairs = (
        srcs.select(F.col("source").alias("sa"))
        .join(srcs.select(F.col("source").alias("sb")), F.col("sa") < F.col("sb"))
    )
    u = (
        pairs.join(
            sk, (F.col("source") == F.col("sa")) | (F.col("source") == F.col("sb"))
        )
        .groupBy("sa", "sb", "hv")
        .agg(
            F.max(F.when(F.col("source") == F.col("sa"), 1).otherwise(0)).alias(
                "in_a"
            ),
            F.max(F.when(F.col("source") == F.col("sb"), 1).otherwise(0)).alias(
                "in_b"
            ),
        )
    )
    w_pair = Window.partitionBy("sa", "sb").orderBy("hv")
    ranked = u.select(
        "sa",
        "sb",
        "hv",
        "in_a",
        "in_b",
        F.row_number().over(w_pair).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("sa", "sb")).alias("n_u"),
    )
    est = ranked.groupBy("sa", "sb").agg(
        F.min(F.when(F.col("rn") == KMVS_K, F.col("hv"))).alias("hk"),
        F.max("n_u").cast("long").alias("n_sketch_union"),
        F.sum(
            F.when(
                (F.col("rn") <= KMVS_K) & (F.col("in_a") == 1) & (F.col("in_b") == 1),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_both_topk"),
    )
    ta = toks.select(F.col("source").alias("sa"), "tok")
    tb = toks.select(F.col("source").alias("sb"), "tok")
    ex = (
        ta.join(tb, ["tok"])
        .filter(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sizes = toks.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    za = sizes.select(F.col("source").alias("sa"), F.col("n").alias("na"))
    zb = sizes.select(F.col("source").alias("sb"), F.col("n").alias("nb"))
    union_exact = (
        F.col("na") + F.col("nb") - F.coalesce(F.col("n_inter"), F.lit(0))
    ).cast("long")
    union_est = F.coalesce(
        F.lit(float(KMVS_K - 1)) * F.lit(_HEX12) / F.col("hk").cast("double"),
        F.col("n_sketch_union").cast("double"),
    )
    return (
        est.join(ex, ["sa", "sb"], "left")
        .join(F.broadcast(za), "sa")
        .join(F.broadcast(zb), "sb")
        .select(
            F.col("sa").alias("src_a"),
            F.col("sb").alias("src_b"),
            union_exact.alias("union_exact"),
            union_est.alias("union_est"),
            (F.abs(union_est - union_exact) / union_exact).alias(
                "union_rel_err"
            ),
            (
                F.coalesce(F.col("n_inter"), F.lit(0)).cast("double")
                / union_exact
            ).alias("jaccard_exact"),
            (F.col("n_both_topk").cast("double") / F.lit(KMVS_K)).alias(
                "jaccard_est"
            ),
        )
    )


CMS_DEPTH = 4
CMS_WIDTH = 256


@register(
    "a_countmin_sketch",
    # Count-min sketch made exactly reproducible: row r hashes token t
    # to column ('0x' || substr(md5(r || '|' || t), 1, 6)) % width, so
    # the d x w counter table — and therefore every estimate
    # min_r(cell[r][h_r(t)]) — is identical in both engines and
    # mergeable across shards by cell-wise addition. Evaluated on the
    # 20 most frequent tokens: est >= truth always (one-sided error),
    # over-estimate = collision mass in the narrowest row.
    oracle=f"""
WITH toks AS (
  SELECT a[i - 1] || ' ' || a[i] AS tok
  FROM (SELECT string_split(lower(text), ' ') AS a FROM documents),
       LATERAL unnest(generate_series(2, len(a))) t(i)
  WHERE a[i - 1] <> '' AND a[i] <> ''
),
counted AS (
  SELECT tok, count(*)::BIGINT AS n FROM toks GROUP BY tok
),
cells AS (
  SELECT r,
         (('0x' || substr(md5(r::VARCHAR || '|' || tok), 1, 6))::BIGINT
          % {CMS_WIDTH}) AS col,
         sum(n)::BIGINT AS cell
  FROM counted, unnest(generate_series(0, {CMS_DEPTH - 1})) t(r)
  GROUP BY 1, 2
),
top AS (
  SELECT tok, n, row_number() OVER (ORDER BY n DESC, tok)::INT AS rank
  FROM counted QUALIFY rank <= 20
)
SELECT t.tok, t.rank, t.n AS true_count,
       min(c.cell)::BIGINT AS cms_est,
       (min(c.cell) - t.n)::BIGINT AS overestimate
FROM top t
JOIN cells c
  ON c.col = (('0x' || substr(md5(c.r::VARCHAR || '|' || t.tok), 1, 6))::BIGINT
              % {CMS_WIDTH})
GROUP BY t.tok, t.rank, t.n
""",
    doc="Count-min sketch over the bigram stream ({d}x{w} counters, "
    "md5 hash family so both engines build the identical table), "
    "evaluated against exact counts for the 20 heaviest tokens. The "
    "sketch build is one groupBy(row, col) over d-exploded counts — "
    "mergeable cell-wise across 1000 executors; estimates are the "
    "row-wise min, never below truth. The streaming-friendly "
    "frequency sketch for when exact per-token counts stop fitting "
    "anywhere.".format(d=CMS_DEPTH, w=CMS_WIDTH),
    tags=("aggregates", "stats", "extension"),
)
def a_countmin_sketch(spark, sf_dir):
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    counted = (
        docs.select(F.split(F.lower("text"), " ").alias("a"))
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(2, size(a)), i -> "
                    "struct(a[i - 2] AS w1, a[i - 1] AS w2))"
                )
            ).alias("p")
        )
        .filter((F.col("p.w1") != "") & (F.col("p.w2") != ""))
        .select(F.concat_ws(" ", "p.w1", "p.w2").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rows = F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("r")
    hashed = counted.select("tok", "n", rows).withColumn(
        "col",
        F.expr(
            "cast(conv(substring(md5(concat(cast(r as string), '|', tok)), 1, 6),"
            f" 16, 10) as bigint) % {CMS_WIDTH}"
        ),
    )
    cells = hashed.groupBy("r", "col").agg(F.sum("n").alias("cell"))
    # TakeOrdered (per-partition heaps) selects the 20 heaviest; the
    # rank window then runs on the 20-row result — never a global
    # window over the whole (corpus-growing) vocabulary
    w = Window.orderBy(F.col("n").desc(), "tok")
    top = (
        counted.orderBy(F.col("n").desc(), "tok")
        .limit(20)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .select("tok", "rank", F.col("n").alias("true_count"))
    )
    probe = top.select(
        "tok", "rank", "true_count", rows
    ).withColumn(
        "col",
        F.expr(
            "cast(conv(substring(md5(concat(cast(r as string), '|', tok)), 1, 6),"
            f" 16, 10) as bigint) % {CMS_WIDTH}"
        ),
    )
    return (
        probe.join(F.broadcast(cells), ["r", "col"])
        .groupBy("tok", "rank", "true_count")
        .agg(F.min("cell").cast("long").alias("cms_est"))
        .withColumn(
            "overestimate", (F.col("cms_est") - F.col("true_count")).cast("long")
        )
    )


HLL_P = 8  # 2^8 = 256 registers

HLL_M = 1 << HLL_P
_HLL_TWO52 = 1 << 52  # 60-bit md5 hash = 8 bucket bits + 52 suffix bits
_HLL_EMPTY_TERM = 1 << 53  # an empty register's 2^(53 - 0) summand
# alpha_m * m^2 * 2^53, precomputed in Python so BOTH engines consume
# the identical double literal (no cross-engine pow/divide chains)
_HLL_ALPHA_M2_53 = 0.7213 / (1.0 + 1.079 / HLL_M) * HLL_M * HLL_M * float(1 << 53)
_HLL_LC_THRESHOLD = 2.5 * HLL_M  # below this, linear counting wins


def hll_tokens(docs):
    """(source, tok, hv): per-doc bigrams with the 60-bit md5 hash —
    shared by the batch query and the streaming register-merge twin."""
    toks = (
        docs.select("source", F.split(F.lower("text"), " ").alias("a"))
        .select(
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(2, size(a)), i -> "
                    "struct(a[i - 2] AS w1, a[i - 1] AS w2))"
                )
            ).alias("p"),
        )
        .filter((F.col("p.w1") != "") & (F.col("p.w2") != ""))
        .select("source", F.concat_ws(" ", "p.w1", "p.w2").alias("tok"))
    )
    return toks.select(
        "source",
        "tok",
        F.expr("cast(conv(substring(md5(tok), 1, 15), 16, 10) as bigint)").alias(
            "hv"
        ),
    )


def hll_registers(h):
    """(source, bucket, m_reg): HLL registers from hashed tokens.
    Registers MAX-merge — across shards, micro-batches, or snapshots —
    which is what makes the sketch maintainable incrementally."""
    m_val = F.when(F.col("hv") % _HLL_TWO52 == 0, F.lit(53)).otherwise(
        F.lit(53)
        - F.length(
            F.regexp_replace(F.bin(F.col("hv") % _HLL_TWO52), "^0+", "")
        )
    )
    return (
        h.select(
            "source",
            F.expr(f"hv div {_HLL_TWO52}").alias("bucket"),  # integer div, never float
            m_val.alias("m"),
        )
        .groupBy("source", "bucket")
        .agg(F.max("m").alias("m_reg"))
    )


def hll_estimate(regs):
    """(source, n_registers_filled, hll_est) from a register table —
    the read-time finalization (BIGINT harmonic sum, raw-vs-linear-
    counting branch), identical to the oracle's arithmetic."""
    sums = regs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_filled"),
        F.sum(F.expr("shiftleft(cast(1 as bigint), 53 - m_reg)")).alias(
            "s_filled"
        ),
    )
    v = (F.lit(HLL_M) - F.col("n_filled")).cast("long")
    e_raw = F.lit(_HLL_ALPHA_M2_53) / (
        F.col("s_filled") + v * F.lit(_HLL_EMPTY_TERM)
    ).cast("double")
    lc = F.lit(float(HLL_M)) * F.format_string(
        "%.7f", F.log(F.lit(float(HLL_M)) / v)
    ).cast("double")
    hll_est = F.when(
        (v > 0) & (e_raw <= F.lit(_HLL_LC_THRESHOLD)), lc
    ).otherwise(e_raw)
    return sums.select(
        "source",
        F.col("n_filled").alias("n_registers_filled"),
        hll_est.alias("hll_est"),
    )


@register(
    "a_hyperloglog_eval",
    # HyperLogLog distinct sketch vs exact, made exactly reproducible
    # (completes the mergeable-sketch family next to KMV and CMS):
    # 60-bit md5 hash -> top 8 bits pick 1 of 256 registers, register
    # value = leading-zero count of the 52 suffix bits + 1, computed
    # INTEGER-exactly via the binary string length (no float log2).
    # The harmonic-mean denominator sum(2^-M) is scaled by 2^53 so it
    # is an exact BIGINT sum (max 256 * 2^53 = 2^61); empty registers
    # contribute 2^53 each. The raw estimate is ONE double division by
    # a Python-precomputed alpha*m^2*2^53 literal; the small-range
    # branch (V empty registers > 0 and E <= 2.5m) uses linear
    # counting m*ln(m/V) with the ln quantized at %.7f (the 1-ulp
    # recipe). Registers max-merge, so shards combine cell-wise — the
    # 100 TB count-distinct workhorse.
    oracle=f"""
WITH toks AS (
  SELECT source, a[i - 1] || ' ' || a[i] AS tok
  FROM (SELECT source, string_split(lower(text), ' ') AS a FROM documents),
       LATERAL unnest(generate_series(2, len(a))) t(i)
  WHERE a[i - 1] <> '' AND a[i] <> ''
),
h AS (
  SELECT source, tok, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS hv
  FROM toks
),
regs AS (
  SELECT source, hv // {_HLL_TWO52} AS bucket,
         max(CASE WHEN hv % {_HLL_TWO52} = 0 THEN 53
                  ELSE 53 - length(regexp_replace(bin(hv % {_HLL_TWO52}),
                                                  '^0+', '')) END) AS m_reg
  FROM h GROUP BY 1, 2
),
sums AS (
  SELECT source, count(*)::BIGINT AS n_filled,
         sum((1::BIGINT << (53 - m_reg)))::BIGINT AS s_filled
  FROM regs GROUP BY 1
),
ex AS (SELECT source, count(DISTINCT tok)::BIGINT AS n_exact FROM h GROUP BY 1),
est AS (
  SELECT s.source, s.n_filled, e.n_exact,
         ({HLL_M} - s.n_filled)::BIGINT AS v,
         {_HLL_ALPHA_M2_53!r}
           / (s.s_filled
              + ({HLL_M} - s.n_filled)::BIGINT * {_HLL_EMPTY_TERM})::DOUBLE
           AS e_raw
  FROM sums s JOIN ex e USING (source)
),
final AS (
  SELECT source, n_exact, n_filled,
         CASE WHEN v > 0 AND e_raw <= {_HLL_LC_THRESHOLD!r}
              THEN {float(HLL_M)!r}
                   * printf('%.7f', ln({float(HLL_M)!r} / v))::DOUBLE
              ELSE e_raw END AS hll_est
  FROM est
)
SELECT source, n_exact, n_filled AS n_registers_filled, hll_est,
       abs(hll_est - n_exact) / n_exact AS rel_err
FROM final
""",
    doc="Per-source distinct-bigram estimate via a 256-register "
    "HyperLogLog vs the exact count, with relative error — the "
    "third mergeable sketch (after KMV and count-min) and the one "
    "production engines actually ship for approx_count_distinct. "
    "Register values come from integer bit arithmetic on a "
    "deterministic md5 hash (binary-string length, never float "
    "log2), the harmonic sum is an exact BIGINT thanks to the 2^53 "
    "scaling, and only the final estimate touches IEEE division — "
    "so both engines compute the bit-identical estimate. One "
    "(source, bucket) groupBy then a per-source fold: map-side "
    "combine all the way, no row ever leaves its shard unaggregated.",
    tags=("aggregates", "stats", "extension"),
)
def a_hyperloglog_eval(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    # r14: the exploded+md5-hashed token stream feeds BOTH the sketch
    # and the exact count; without a cut the split/explode/md5 runs
    # twice (6.1 -> 1.2 s cold, 0.97 -> 0.52 s warm at sf0.01). The
    # cut materializes one local copy of the token stream — at scale
    # the same trade as one shuffle write vs a second full hash pass.
    h = hll_tokens(docs).transform(lineage_cut_lazy)
    est = hll_estimate(hll_registers(h))
    ex = h.groupBy("source").agg(F.countDistinct("tok").alias("n_exact"))
    return (
        est.join(ex, "source")
        .select("source", "n_exact", "n_registers_filled", "hll_est")
        .withColumn(
            "rel_err",
            F.abs(F.col("hll_est") - F.col("n_exact")) / F.col("n_exact"),
        )
    )


JOINCARD_WIDTH = 4096  # sized to the key count (2k parts): w >= n_keys


@register(
    "a_cms_join_cardinality",
    # Join-size estimation from count-min sketches (the AGMS/CMS inner
    # product): |A self-join| = sum_k f(k)^2 is estimated per sketch
    # row by sum_c cell^2, taking the min across rows — the optimizer
    # trick that prices a join from two sketch scans without touching
    # the data. One-sided like the point estimate: never below truth.
    # All-integer until the final ratio division.
    oracle=f"""
WITH f AS (
  SELECT l_partkey AS k, count(*)::BIGINT AS n FROM lineitem GROUP BY 1
),
truth AS (SELECT sum(n * n)::BIGINT AS true_pairs,
                 count(*)::BIGINT AS n_keys FROM f),
cells AS (
  SELECT r,
         (('0x' || substr(md5(r::VARCHAR || '|' || k::VARCHAR), 1, 6))::BIGINT
          % {JOINCARD_WIDTH}) AS col,
         sum(n)::BIGINT AS cell
  FROM f, unnest(generate_series(0, {CMS_DEPTH - 1})) t(r)
  GROUP BY 1, 2
),
est AS (
  SELECT min(row_est)::BIGINT AS cms_est_pairs
  FROM (SELECT r, sum(cell * cell) AS row_est FROM cells GROUP BY r)
)
SELECT t.n_keys, t.true_pairs, e.cms_est_pairs,
       e.cms_est_pairs::DOUBLE / t.true_pairs AS overestimate_ratio
FROM truth t, est e
""",
    doc="CMS inner-product join-cardinality estimate for the lineitem "
    "part-key self-join: sketch each side (here: the same side twice), "
    "estimate the join size as the min over rows of the cell-wise "
    "product sum, and report it against the exact sum of squared "
    "frequencies. The estimate prices a 100 TB join from two "
    "kilobyte sketches — the sketch-based stats a join planner uses "
    "when exact NDV/frequency stats are stale or absent.",
    tags=("aggregates", "stats", "extension"),
)
def a_cms_join_cardinality(spark, sf_dir):
    f = (
        load(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_partkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    truth = f.agg(
        F.sum(F.col("n") * F.col("n")).alias("true_pairs"),
        F.count(F.lit(1)).alias("n_keys"),
    )
    cells = (
        f.select(
            "k",
            "n",
            F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("r"),
        )
        .withColumn(
            "col",
            F.expr(
                "cast(conv(substring(md5(concat(cast(r as string), '|', "
                f"cast(k as string))), 1, 6), 16, 10) as bigint) % {JOINCARD_WIDTH}"
            ),
        )
        .groupBy("r", "col")
        .agg(F.sum("n").alias("cell"))
    )
    est = (
        cells.groupBy("r")
        .agg(F.sum(F.col("cell") * F.col("cell")).alias("row_est"))
        .agg(F.min("row_est").cast("long").alias("cms_est_pairs"))
    )
    return truth.crossJoin(est).select(
        "n_keys",
        "true_pairs",
        "cms_est_pairs",
        (F.col("cms_est_pairs").cast("double") / F.col("true_pairs")).alias(
            "overestimate_ratio"
        ),
    )


@register(
    "a_dp_noisy_counts",
    # Differentially-private count release (Laplace mechanism,
    # epsilon=1, sensitivity 1) with a DETERMINISTIC noise draw:
    # u ~ U(0,1) comes from the first 12 md5 hex digits of the release
    # key (a real deployment uses a sealed per-release seed — the
    # draw must be reproducible for audit but unpredictable to the
    # adversary, which a keyed hash gives), and Laplace noise is the
    # inverse CDF -b*sign(u-.5)*ln(1-2|u-.5|). ln() is 1-ulp across
    # engines, so the noise is quantized at 7 dp per release row (the
    # smallest frame) before the addition; count + quantized-noise is
    # one exact double add.
    oracle="""
WITH g AS (SELECT source, count(*)::BIGINT AS n_docs FROM documents GROUP BY 1),
u AS (
  SELECT source, n_docs,
         (('0x' || substr(md5('dp1|' || source), 1, 12))::BIGINT)::DOUBLE
           / 281474976710656.0 - 0.5::DOUBLE AS uc
  FROM g
),
nz AS (
  SELECT source, n_docs,
         printf('%.7f', -1.0::DOUBLE * sign(uc)
                * ln(1.0::DOUBLE - 2.0::DOUBLE * abs(uc)))::DOUBLE AS noise
  FROM u
)
SELECT source, n_docs, noise, n_docs + noise AS released_count
FROM nz
""",
    doc="Differentially-private per-source doc-count release: Laplace "
    "(eps=1) noise from a keyed-hash inverse-CDF draw — reproducible "
    "for audit, engine-identical (1-ulp ln absorbed by the %.7f "
    "quantization recipe), and embarrassingly parallel (noise is a "
    "per-row expression over the aggregated group table; the fact "
    "table never re-shuffles). The privacy-release pattern a data "
    "clearinghouse runs before publishing corpus statistics.",
    tags=("aggregates", "stats", "extension"),
)
def a_dp_noisy_counts(spark, sf_dir):
    g = (
        load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    uc = (
        F.expr(
            "cast(cast(conv(substring(md5(concat('dp1|', source)), 1, 12), 16, 10)"
            " as bigint) as double)"
        )
        / F.lit(281474976710656.0)
        - F.lit(0.5)
    )
    noise = F.format_string(
        "%.7f",
        F.lit(-1.0)
        * F.signum(uc)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(uc)),
    ).cast("double")
    return g.select(
        "source",
        "n_docs",
        noise.alias("noise"),
        (F.col("n_docs") + noise).alias("released_count"),
    )


QSKETCH_BINS = 256
_QPROBS = [("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)]


def _hist_est_sql(num: int, den: int) -> str:
    # first bin whose cumulative count reaches rank ceil(q*n), linear
    # interpolation inside the bin — operation order matches the Spark
    # expression token for token
    return f"""(
  SELECT min(lo + (hi - lo) *
             ((bin::DOUBLE + ((n * {num} + {den} - 1) // {den} - cum_before)::DOUBLE
               / bin_n::DOUBLE) / {QSKETCH_BINS}.0::DOUBLE))
  FROM hist WHERE cum >= (n * {num} + {den} - 1) // {den}
    AND cum_before < (n * {num} + {den} - 1) // {den}
)"""


@register(
    "a_quantile_sketch_eval",
    oracle=f"""
WITH b AS (
  SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi,
         count(*)::BIGINT AS n
  FROM orders
),
binned AS (
  SELECT least({QSKETCH_BINS - 1},
               floor((o_totalprice - b.lo) / (b.hi - b.lo)
                     * {QSKETCH_BINS}.0::DOUBLE)::BIGINT) AS bin
  FROM orders, b
),
hist AS (
  SELECT bin, count(*)::BIGINT AS bin_n,
         sum(count(*)) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)::BIGINT AS cum,
         (sum(count(*)) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
          - count(*))::BIGINT AS cum_before,
         (SELECT lo FROM b) AS lo, (SELECT hi FROM b) AS hi,
         (SELECT n FROM b) AS n
  FROM binned GROUP BY bin
),
exact AS (
  -- lower-element rank ((n-1)*q)//den + 1 — token-for-token the
  -- exact_group_quantiles convention (the histogram-estimate side
  -- keeps its ceil rank, mirrored identically in both engines)
  SELECT
    {', '.join(f'''min(CASE WHEN rn = ((n - 1) * {num}) // {den} + 1
         THEN o_totalprice END) AS {label}_exact''' for label, num, den in _QPROBS)}
  FROM (SELECT o_totalprice,
               row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
               count(*) OVER () AS n
        FROM orders)
)
SELECT (SELECT n FROM b) AS n,
       {', '.join(f'{_hist_est_sql(num, den)} AS {label}_est, exact.{label}_exact'
                  for label, num, den in _QPROBS)}
FROM exact
""",
    doc="Histogram-quantile estimation vs exact: a 256-bin equi-width "
    "histogram (bin counts are MERGEABLE — shards add cell-wise, the "
    "t-digest role without its merge-order nondeterminism) estimates "
    "P50/P90/P99 of order totals by linear interpolation inside the "
    "crossing bin, reported next to the exact rank-selected values. "
    "The histogram build is one groupBy(bin) with map-side partials; "
    "bounds come from one min/max pass. The estimate-vs-exact gap is "
    "the number that decides whether the cheap mergeable sketch is "
    "good enough for a given column at 100 TB.",
    tags=("aggregates", "stats", "extension"),
)
def a_quantile_sketch_eval(spark, sf_dir):
    from pyspark.sql import Window

    orders = load(spark, sf_dir, "orders")
    b = orders.agg(
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    binned = orders.crossJoin(F.broadcast(b)).select(
        F.least(
            F.lit(QSKETCH_BINS - 1),
            F.floor(
                (F.col("o_totalprice") - F.col("lo"))
                / (F.col("hi") - F.col("lo"))
                * F.lit(float(QSKETCH_BINS))
            ).cast("long"),
        ).alias("bin"),
        "lo",
        "hi",
        "n",
    )
    wc = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist = (
        binned.groupBy("bin", "lo", "hi", "n")
        .agg(F.count(F.lit(1)).alias("bin_n"))
        .withColumn("cum", F.sum("bin_n").over(wc))
        .withColumn("cum_before", F.col("cum") - F.col("bin_n"))
    )
    # exact side: distributed rank selection on the same value buckets
    from ..operators.quantiles import exact_group_quantiles

    exact = exact_group_quantiles(
        orders.withColumn("g", F.lit("all")),
        "g",
        "o_totalprice",
        "o_orderkey",
        _QPROBS,
        F.floor(F.col("o_totalprice") / 10000).cast("long"),
    )
    # all three interpolated estimates fall out of ONE aggregate over
    # the 256-row histogram (conditional min per target, like the
    # oracle's exact CTE) — one crossJoin of two 1-row frames total
    est_cols = []
    for label, num, den in _QPROBS:
        target = F.expr(f"(n * {num} + {den} - 1) div {den}")
        est_cols.append(
            F.min(
                F.when(
                    (F.col("cum") >= target) & (F.col("cum_before") < target),
                    F.col("lo")
                    + (F.col("hi") - F.col("lo"))
                    * (
                        (
                            F.col("bin").cast("double")
                            + (target - F.col("cum_before")).cast("double")
                            / F.col("bin_n").cast("double")
                        )
                        / F.lit(float(QSKETCH_BINS))
                    ),
                )
            ).alias(f"{label}_est")
        )
    ests = hist.agg(F.max("n").cast("long").alias("n"), *est_cols)
    out = exact.select(
        *[F.col(label).alias(f"{label}_exact") for label, _, _ in _QPROBS]
    )
    cols = ["n"]
    for label, _, _ in _QPROBS:
        cols += [f"{label}_est", f"{label}_exact"]
    return ests.crossJoin(F.broadcast(out)).select(*cols)


@register(
    "a_table_checksum",
    # Order-insensitive content checksum per table: bit_xor of a
    # 60-bit md5-derived row hash — the anti-entropy check two
    # replicas (or two engines, or two snapshots) compare without
    # moving rows. xxhash64 seeds differ across engines, so the row
    # hash is md5 over a canonical '|'-joined rendering; dates render
    # as ISO strings and doubles are excluded (engine float-to-string
    # formatting differs — measures are checksummed via their exact
    # decimal totals instead, which the count/sum columns carry).
    oracle="""
SELECT 'orders' AS table_name, count(*)::BIGINT AS n_rows,
       bit_xor(('0x' || substr(md5(
         o_orderkey::VARCHAR || '|' || o_custkey::VARCHAR || '|' ||
         o_orderstatus || '|' || strftime(o_orderdate, '%Y-%m-%d') || '|' ||
         o_orderpriority), 1, 15))::BIGINT)::BIGINT AS content_hash,
       round(sum(o_totalprice::DECIMAL(30,10)), 4)::DOUBLE AS total_measure
FROM orders
UNION ALL
SELECT 'customer', count(*)::BIGINT,
       bit_xor(('0x' || substr(md5(
         c_custkey::VARCHAR || '|' || c_name || '|' || c_mktsegment || '|' ||
         c_nationkey::VARCHAR), 1, 15))::BIGINT)::BIGINT,
       round(sum(c_acctbal::DECIMAL(30,10)), 4)::DOUBLE
FROM customer
""",
    doc="Table content checksums: per table, an order-insensitive "
    "bit_xor of md5 row hashes over the canonical key/dimension "
    "rendering plus the exact-decimal measure total — the "
    "anti-entropy fingerprint replicas and migration targets compare "
    "instead of shipping rows. XOR is commutative/associative, so "
    "1000 executors each fold their partition and the combine is "
    "free; any single changed, dropped or duplicated row flips the "
    "hash.",
    tags=("aggregates", "extension"),
)
def a_table_checksum(spark, sf_dir):
    from ..functions.exact import dsum

    orders = load(spark, sf_dir, "orders")
    o = orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr(
            "bit_xor(cast(conv(substring(md5(concat_ws('|', "
            "cast(o_orderkey as string), cast(o_custkey as string), "
            "o_orderstatus, date_format(o_orderdate, 'yyyy-MM-dd'), "
            "o_orderpriority)), 1, 15), 16, 10) as bigint))"
        ).cast("long").alias("content_hash"),
        dsum("o_totalprice").alias("total_measure"),
    ).select(F.lit("orders").alias("table_name"), "n_rows", "content_hash", "total_measure")
    cust = load(spark, sf_dir, "customer")
    c = cust.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr(
            "bit_xor(cast(conv(substring(md5(concat_ws('|', "
            "cast(c_custkey as string), c_name, c_mktsegment, "
            "cast(c_nationkey as string))), 1, 15), 16, 10) as bigint))"
        ).cast("long").alias("content_hash"),
        dsum("c_acctbal").alias("total_measure"),
    ).select(F.lit("customer").alias("table_name"), "n_rows", "content_hash", "total_measure")
    return o.unionByName(c)


@register(
    "a_winsorized_mean",
    # Winsorized mean of order totals: clamp to the exact rank-selected
    # P05/P95 (lower-element convention, unique (value, key) chain),
    # then the decimal-exact mean — the robust location estimate that
    # keeps every row (unlike the trimmed mean) while bounding tail
    # influence. Plain mean reported alongside for the influence gap.
    oracle="""
WITH ranked AS (
  SELECT o_totalprice,
         row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
         count(*) OVER () AS n
  FROM orders
),
cuts AS (
  -- lower-element convention ((n-1)*q)//den + 1, token-for-token the
  -- exact_group_quantiles rank (the ceil form only agreed at n%20==0)
  SELECT min(CASE WHEN rn = ((n - 1) * 5) // 100 + 1 THEN o_totalprice END) AS lo,
         min(CASE WHEN rn = ((n - 1) * 95) // 100 + 1 THEN o_totalprice END) AS hi
  FROM ranked
)
SELECT (SELECT max(n) FROM ranked)::BIGINT AS n,
       c.lo AS p05, c.hi AS p95,
       round(sum((CASE WHEN o_totalprice < c.lo THEN c.lo
                       WHEN o_totalprice > c.hi THEN c.hi
                       ELSE o_totalprice END)::DECIMAL(30,10)), 4)::DOUBLE
         / count(*) AS winsorized_mean,
       round(sum((o_totalprice)::DECIMAL(30,10)), 4)::DOUBLE / count(*)
         AS plain_mean
FROM orders, cuts c
GROUP BY c.lo, c.hi
""",
    doc="Winsorized mean (5%/95%) of order totals next to the plain "
    "mean: cutoffs come from the distributed rank-selection machinery "
    "(bucket counts locate the two target ranks; only the selected "
    "buckets sort), the clamp is a per-row expression with the "
    "cutoffs broadcast, and both means go through exact decimal — "
    "the robust location estimate for skew-prone revenue columns.",
    tags=("aggregates", "stats", "extension"),
)
def a_winsorized_mean(spark, sf_dir):
    from ..functions.exact import DEC
    from ..operators.quantiles import exact_group_quantiles

    orders = load(spark, sf_dir, "orders")
    cuts = exact_group_quantiles(
        orders.withColumn("g", F.lit("all")),
        "g",
        "o_totalprice",
        "o_orderkey",
        [("p05", 5, 100), ("p95", 95, 100)],
        F.floor(F.col("o_totalprice") / 10000).cast("long"),
    ).select(F.col("p05").alias("lo"), F.col("p95").alias("hi"))
    w = F.when(F.col("o_totalprice") < F.col("lo"), F.col("lo")).when(
        F.col("o_totalprice") > F.col("hi"), F.col("hi")
    ).otherwise(F.col("o_totalprice"))
    return (
        orders.crossJoin(F.broadcast(cuts))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("lo").alias("p05"),
            F.min("hi").alias("p95"),
            (
                F.round(F.sum(w.cast(DEC)), 4).cast("double") / F.count(F.lit(1))
            ).alias("winsorized_mean"),
            (
                F.round(F.sum(F.col("o_totalprice").cast(DEC)), 4).cast("double")
                / F.count(F.lit(1))
            ).alias("plain_mean"),
        )
    )


@register(
    "a_linreg_trend",
    # Per-event-type OLS trend of the daily value series: slope /
    # intercept / R^2 from the five closed-form moments, every moment
    # an exact-decimal sum and the final algebra a fixed IEEE op
    # order — the deterministic little-sibling of MLlib's
    # LinearRegression for the 1-feature trend-line case (and the
    # global-fit complement of e_theilsen_trend's robust slope).
    oracle=f"""
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '2024-01-01', ts::DATE)::BIGINT AS x,
         {dsum_sql('value')} AS y
  FROM events GROUP BY event_type, x
),
m AS (
  -- syy_k: the one sum that grows QUADRATICALLY with sf (y ~ 3e5 at
  -- sf1 -> y^2 ~ 1e11, 30 days -> 3.4e12, past the 9e11 dsum->double
  -- envelope; the r12 sf1 gate caught the last-bit r2 divergence).
  -- Down-scale y by 1e-2 per factor BEFORE squaring (the rank-stats
  -- convention): syy_k ~ 3.4e8 at sf1, envelope holds to ~sf51 —
  -- syy_k is the first breach (sxy ~sf6000, sy ~sf8.6e4). 1e-2, not
  -- 1e-3: the 4-dp quantization of syy_k must stay small against the
  -- CANCELLED deny = n*syy - sy^2 (~3e3 at sf0.001 in 1e-4 units);
  -- at 1e-2 the induced r2 error is ~5e-7 rel at sf0.001, inside the
  -- value-parity tolerance (tests/test_value_parity.py derivation).
  SELECT event_type,
         count(*)::BIGINT AS n,
         sum(x)::BIGINT AS sx,
         sum(x * x)::BIGINT AS sxx,
         {dsum_sql('y')} AS sy,
         {dsum_sql('(x::DOUBLE * y)')} AS sxy,
         {dsum_sql('((y * 1e-2) * (y * 1e-2))')} AS syy_k
  FROM daily GROUP BY event_type
)
SELECT event_type, n,
       (n::DOUBLE * sxy - sx::DOUBLE * sy)
         / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) AS slope,
       (sy - (n::DOUBLE * sxy - sx::DOUBLE * sy)
               / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
             * sx::DOUBLE) / n AS intercept,
       -- scale-consistent: num_k = num*1e-2 pairs with deny_k =
       -- deny*1e-4, so num_k^2/(denx*deny_k) == num^2/(denx*deny)
       CASE WHEN n::DOUBLE * syy_k - (sy * 1e-2) * (sy * 1e-2) > 0.0::DOUBLE
            THEN (((n::DOUBLE * sxy - sx::DOUBLE * sy) * 1e-2)
                  * ((n::DOUBLE * sxy - sx::DOUBLE * sy) * 1e-2))
                 / ((n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                    * (n::DOUBLE * syy_k - (sy * 1e-2) * (sy * 1e-2)))
            ELSE NULL END AS r2
FROM m
""",
    doc="OLS daily-revenue trend per event type: slope, intercept, R^2 "
    "from decimal-exact moments (integer x sums are exact BIGINTs; y "
    "moments ride the decimal path; the closed-form algebra is the "
    "identical IEEE sequence in both engines, zero-variance guarded). "
    "One shuffle to the daily grain, one to the per-type moments — "
    "the same two-pass shape at any scale.",
    tags=("aggregates", "stats", "extension"),
)
def a_linreg_trend(spark, sf_dir):
    from ..functions.exact import dsum

    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("x"),
    ).agg(dsum("value").alias("y"))
    # syy is the one moment that grows quadratically with sf (daily y
    # ~ 3e5 at sf1 -> sum(y^2) ~ 3.4e12 > the 9e11 dsum->double
    # envelope; the r12 sf1 gate caught the last-bit r2 divergence).
    # Rank-stats convention: down-scale y by 1e-2 per squared factor —
    # syy_k ~ 3.4e8 at sf1, envelope holds to ~sf51 (first breach is
    # syy_k; sxy breaches ~sf6000, sy ~sf8.6e4). 1e-2 rather than a
    # deeper scale because syy_k's 4-dp quantization must stay small
    # against the CANCELLED deny = n*syy - sy^2 — at 1e-2 the induced
    # r2 error is ~5e-7 rel at sf0.001 (tests/test_value_parity.py
    # carries the derivation). r2 algebra then uses the
    # scale-consistent pieces num_k = num*1e-2, deny_k = deny*1e-4.
    ys = F.col("y") * F.lit(1.0e-2)
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        dsum("y").alias("sy"),
        dsum(F.col("x").cast("double") * F.col("y")).alias("sxy"),
        dsum(ys * ys).alias("syy_k"),
    )
    n_d = F.col("n").cast("double")
    sx_d = F.col("sx").cast("double")
    sxx_d = F.col("sxx").cast("double")
    sy_k = F.col("sy") * F.lit(1.0e-2)
    num = n_d * F.col("sxy") - sx_d * F.col("sy")
    num_k = num * F.lit(1.0e-2)
    denx = n_d * sxx_d - sx_d * sx_d
    deny_k = n_d * F.col("syy_k") - sy_k * sy_k
    slope = num / denx
    return m.select(
        "event_type",
        "n",
        slope.alias("slope"),
        ((F.col("sy") - slope * sx_d) / F.col("n")).alias("intercept"),
        F.when(deny_k > F.lit(0.0), (num_k * num_k) / (denx * deny_k)).alias("r2"),
    )


BASKET_MIN_SUPPORT = 3  # pair must co-occur in >= 3 orders


@register(
    "a_market_basket_lift",
    # Market-basket association mining (the Apriori 2-itemset pass):
    # per-order part pairs -> support counts -> confidence and lift
    # from exact integer counts. The pair space is bounded the same
    # way the triangle count bounds wedges: pairs are generated
    # per-order (never a global part x part cross), and a min-support
    # HAVING prunes the long tail before the dimension joins. Top-20
    # by lift under a unique (lift, part_a, part_b) order chain.
    oracle=f"""
WITH op AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
n_orders AS (SELECT count(DISTINCT l_orderkey)::BIGINT AS n FROM lineitem),
item AS (SELECT l_partkey, count(*)::BIGINT AS n_item FROM op GROUP BY 1),
pair AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         count(*)::BIGINT AS n_pair
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= {BASKET_MIN_SUPPORT}
)
SELECT part_a, part_b, n_pair,
       ia.n_item AS n_a, ib.n_item AS n_b,
       n_pair::DOUBLE / (SELECT n FROM n_orders) AS support,
       n_pair::DOUBLE / ia.n_item AS confidence_a_to_b,
       (n_pair::DOUBLE * (SELECT n FROM n_orders))
         / (ia.n_item::DOUBLE * ib.n_item::DOUBLE) AS lift
FROM pair
JOIN item ia ON ia.l_partkey = part_a
JOIN item ib ON ib.l_partkey = part_b
ORDER BY lift DESC, part_a, part_b
LIMIT 20
""",
    doc="Market-basket 2-itemset mining: per-order part-pair supports "
    "(generated per order, never a global cross product), min-support "
    "pruning BEFORE the per-item joins, then confidence and lift from "
    "exact integer counts — single IEEE divisions, identical in both "
    "engines. Top-20 by lift with a unique order chain. The shape "
    "scales because the pair explosion is bounded by per-order basket "
    "size (sum of k_i^2), not by catalog size.",
    tags=("aggregates", "extension"),
)
def a_market_basket_lift(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct().transform(
        lineage_cut_lazy
    )  # consumed by item counts AND both sides of the pair join
    n_orders = op.select("l_orderkey").distinct().count()
    item = op.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_item"))
    b = op.select(
        F.col("l_orderkey").alias("o2"), F.col("l_partkey").alias("part_b")
    )
    pair = (
        op.join(b, (op.l_orderkey == b.o2) & (op.l_partkey < b.part_b))
        .groupBy(F.col("l_partkey").alias("part_a"), "part_b")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= BASKET_MIN_SUPPORT)
    )
    ia = item.select(F.col("l_partkey").alias("part_a"), F.col("n_item").alias("n_a"))
    ib = item.select(F.col("l_partkey").alias("part_b"), F.col("n_item").alias("n_b"))
    return (
        pair.join(ia, "part_a")
        .join(ib, "part_b")
        .select(
            "part_a",
            "part_b",
            "n_pair",
            "n_a",
            "n_b",
            (F.col("n_pair").cast("double") / F.lit(n_orders)).alias("support"),
            (F.col("n_pair").cast("double") / F.col("n_a")).alias(
                "confidence_a_to_b"
            ),
            (
                (F.col("n_pair").cast("double") * F.lit(n_orders))
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "part_a", "part_b")
        .limit(20)
    )


@register(
    "a_anova_oneway",
    # One-way ANOVA of purchase value across event types: F statistic
    # and eta-squared from the sums-of-squares identities
    # SSB = sum_g S_g^2/n_g - S^2/n, SSW = sum x^2 - sum_g S_g^2/n_g.
    # Group sums and the global sum-of-squares ride the exact decimal
    # path; the per-group S_g^2/n_g terms are quantized %.7f before
    # their (order-sensitive) 5-term float sum goes through the
    # decimal path too — so the whole test statistic is
    # engine-identical with NO transcendental anywhere (unlike the
    # chi2/z companions, ANOVA is pure rational arithmetic).
    oracle=f"""
WITH g AS (
  SELECT event_type,
         count(*)::BIGINT AS n_g,
         {dsum_sql('value')} AS s_g,
         {dsum_sql('(value * value)')} AS ss_g
  FROM events GROUP BY event_type
),
terms AS (
  SELECT event_type, n_g, s_g, ss_g,
         printf('%.7f', s_g * s_g / n_g)::DOUBLE AS t_g
  FROM g
),
tot AS (
  SELECT sum(n_g)::BIGINT AS n,
         round(sum((s_g)::DECIMAL(30,10)), 4)::DOUBLE AS s,
         round(sum((ss_g)::DECIMAL(30,10)), 4)::DOUBLE AS ss,
         round(sum((t_g)::DECIMAL(30,10)), 4)::DOUBLE AS sum_t,
         count(*)::BIGINT AS k
  FROM terms
)
SELECT k, n,
       sum_t - s * s / n AS ss_between,
       ss - sum_t AS ss_within,
       ((sum_t - s * s / n) / (k - 1))
         / ((ss - sum_t) / (n - k)) AS f_stat,
       (sum_t - s * s / n)
         / (sum_t - s * s / n + (ss - sum_t)) AS eta_squared
FROM tot
""",
    doc="One-way ANOVA (value by event type): F statistic and "
    "eta-squared effect size from decimal-exact group sums and "
    "sums-of-squares — one map-side-combined pass over the fact "
    "table, then 5-row algebra. Completes the classical-test family "
    "(chi2 independence, two-proportion z, KS two-sample) with the "
    "k-group mean comparison; pure rational arithmetic, bit-identical "
    "across engines.",
    tags=("aggregates", "stats", "extension"),
)
def a_anova_oneway(spark, sf_dir):
    from ..functions.exact import DEC, RSCALE, dsum

    ev = load(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_g"),
        dsum("value").alias("s_g"),
        dsum(F.col("value") * F.col("value")).alias("ss_g"),
    )
    terms = g.withColumn(
        "t_g",
        F.format_string(
            "%.7f", F.col("s_g") * F.col("s_g") / F.col("n_g")
        ).cast("double"),
    )

    def dsum_simple(c):
        return F.round(F.sum(F.col(c).cast(DEC)), RSCALE).cast("double")

    tot = terms.agg(
        F.sum("n_g").cast("long").alias("n"),
        dsum_simple("s_g").alias("s"),
        dsum_simple("ss_g").alias("ss"),
        dsum_simple("t_g").alias("sum_t"),
        F.count(F.lit(1)).alias("k"),
    )
    ssb = F.col("sum_t") - F.col("s") * F.col("s") / F.col("n")
    ssw = F.col("ss") - F.col("sum_t")
    return tot.select(
        "k",
        "n",
        ssb.alias("ss_between"),
        ssw.alias("ss_within"),
        ((ssb / (F.col("k") - 1)) / (ssw / (F.col("n") - F.col("k")))).alias(
            "f_stat"
        ),
        (ssb / (ssb + ssw)).alias("eta_squared"),
    )


@register(
    "a_dq_constraint_suite",
    # Declarative data-quality constraint suite (the Deequ/
    # great-expectations pattern, public): completeness, key
    # uniqueness, value range, accepted values, and referential
    # integrity computed as a handful of aggregates and emitted as
    # one constraint report — the verification gate a 100 TB ingest
    # runs before publishing a partition. Every metric is a ratio of
    # exact counts (one IEEE division); pass thresholds are literals.
    # Scale shape: completeness/range/accepted-values fold into ONE
    # scan of the fact table (map-side partials); uniqueness is one
    # distinct-count on the key; referential integrity is a
    # broadcast-able anti-join count — no constraint needs a sort.
    oracle="""
WITH scan AS (
  SELECT count(*)::BIGINT AS n,
         sum(CASE WHEN l_shipdate IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_ship,
         sum(CASE WHEN l_quantity >= 1 AND l_quantity <= 50 THEN 1 ELSE 0 END)::BIGINT AS n_qty,
         sum(CASE WHEN l_returnflag IN ('A', 'N', 'R') THEN 1 ELSE 0 END)::BIGINT AS n_rf
  FROM lineitem
),
uniq AS (
  SELECT count(*)::BIGINT AS n_keys,
         count(DISTINCT (l_orderkey, l_linenumber))::BIGINT AS n_distinct
  FROM lineitem
),
ref AS (
  SELECT count(*)::BIGINT AS n_orphans
  FROM lineitem l ANTI JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT * FROM (
  SELECT 'completeness_l_shipdate' AS constraint_name,
         n_ship::DOUBLE / n AS metric, 1.0::DOUBLE AS threshold,
         (n_ship = n) AS passed
  FROM scan
  UNION ALL
  SELECT 'range_l_quantity_1_50', n_qty::DOUBLE / n, 1.0::DOUBLE, n_qty = n
  FROM scan
  UNION ALL
  SELECT 'accepted_values_l_returnflag', n_rf::DOUBLE / n, 1.0::DOUBLE, n_rf = n
  FROM scan
  UNION ALL
  SELECT 'unique_pk_orderkey_linenumber', n_distinct::DOUBLE / n_keys,
         1.0::DOUBLE, n_distinct = n_keys
  FROM uniq
  UNION ALL
  SELECT 'referential_l_orderkey_in_orders',
         1.0::DOUBLE - n_orphans::DOUBLE / (SELECT n FROM scan),
         1.0::DOUBLE, n_orphans = 0
  FROM ref
)
""",
    doc="Data-quality constraint suite: five declarative checks "
    "(completeness, range, accepted values, key uniqueness, "
    "referential integrity) over the fact table as one report — "
    "three fold into a single scan's partial aggregates, uniqueness "
    "is one distinct-count, referential is an anti-join count. The "
    "publish-gate pattern for verified ingest at scale.",
    tags=("aggregates", "extension"),
)
def a_dq_constraint_suite(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").select("o_orderkey")
    scan = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("l_shipdate").isNotNull(), 1).otherwise(0)).alias(
            "n_ship"
        ),
        F.sum(
            F.when((F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 50), 1)
            .otherwise(0)
        ).alias("n_qty"),
        F.sum(
            F.when(F.col("l_returnflag").isin("A", "N", "R"), 1).otherwise(0)
        ).alias("n_rf"),
    )
    uniq = li.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.countDistinct("l_orderkey", "l_linenumber").alias("n_distinct"),
    )
    ref = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"], "left_anti")
        .agg(F.count(F.lit(1)).alias("n_orphans"))
    )
    base = scan.crossJoin(uniq).crossJoin(ref)  # three 1-row frames

    def row(name, metric, passed):
        return base.select(
            F.lit(name).alias("constraint_name"),
            metric.alias("metric"),
            F.lit(1.0).alias("threshold"),
            passed.alias("passed"),
        )

    n = F.col("n").cast("double")
    out = row(
        "completeness_l_shipdate",
        F.col("n_ship").cast("double") / n,
        F.col("n_ship") == F.col("n"),
    )
    out = out.unionByName(
        row(
            "range_l_quantity_1_50",
            F.col("n_qty").cast("double") / n,
            F.col("n_qty") == F.col("n"),
        )
    )
    out = out.unionByName(
        row(
            "accepted_values_l_returnflag",
            F.col("n_rf").cast("double") / n,
            F.col("n_rf") == F.col("n"),
        )
    )
    out = out.unionByName(
        row(
            "unique_pk_orderkey_linenumber",
            F.col("n_distinct").cast("double") / F.col("n_keys").cast("double"),
            F.col("n_distinct") == F.col("n_keys"),
        )
    )
    return out.unionByName(
        row(
            "referential_l_orderkey_in_orders",
            F.lit(1.0) - F.col("n_orphans").cast("double") / n,
            F.col("n_orphans") == 0,
        )
    )


@register(
    "a_k_anonymity",
    # k-anonymity census (Sweeney 2002, public — the re-identification
    # audit behind every quasi-identifier release decision): rows
    # sharing a quasi-identifier tuple (nation, market segment,
    # account-balance bucket) form an equivalence class; a row's k is
    # its class size, and rows with small k are re-identifiable. The
    # census buckets classes by k-band and reports the row shares —
    # including the k<5 share a release gate would block on. Two
    # aggregates (class sizes, then band rollup); integer counts + one
    # division. At 100 TB the class-size table is bounded by the QI
    # domain, not the fact table.
    oracle="""
WITH classes AS (
  SELECT c_nationkey, c_mktsegment,
         -- floor(), NOT '//': DuckDB's // on DOUBLEs rounds-to-nearest
         -- (1863.84 // 1000 = 2), it is not floor division
         floor(c_acctbal / 1000)::BIGINT AS bal_bucket,
         count(*)::BIGINT AS k
  FROM customer
  GROUP BY 1, 2, 3
),
tot AS (SELECT sum(k)::BIGINT AS n FROM classes)
SELECT CASE WHEN k = 1 THEN 'a_k_eq_1'
            WHEN k < 5 THEN 'b_k_2_4'
            WHEN k < 10 THEN 'c_k_5_9'
            ELSE 'd_k_10_plus' END AS k_band,
       count(*)::BIGINT AS n_classes,
       sum(k)::BIGINT AS n_rows,
       min(k)::BIGINT AS k_min,
       sum(k)::DOUBLE / (SELECT n FROM tot) AS row_share
FROM classes
GROUP BY 1
""",
    doc="k-anonymity census over (nation, segment, balance-bucket) "
    "quasi-identifiers: equivalence-class sizes banded by k with row "
    "shares — the privacy audit that decides whether a projection is "
    "releasable (k=1 rows are unique, k<5 conventionally blocked). "
    "Class table bounded by the QI domain; everything else is "
    "hash-aggregate traffic.",
    tags=("aggregates", "extension"),
)
def a_k_anonymity(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    classes = (
        cust.groupBy(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_bucket"),
        )
        .agg(F.count(F.lit(1)).alias("k"))
        .transform(lineage_cut_lazy)  # consumed by total + the band rollup
    )
    tot = classes.agg(F.sum("k").alias("n"))
    band = (
        F.when(F.col("k") == 1, "a_k_eq_1")
        .when(F.col("k") < 5, "b_k_2_4")
        .when(F.col("k") < 10, "c_k_5_9")
        .otherwise("d_k_10_plus")
    )
    return (
        classes.groupBy(band.alias("k_band"))
        .agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.sum("k").cast("long").alias("n_rows"),
            F.min("k").cast("long").alias("k_min"),
            F.sum("k").alias("_rows_d"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "k_band",
            "n_classes",
            "n_rows",
            "k_min",
            (F.col("_rows_d").cast("double") / F.col("n")).alias("row_share"),
        )
    )


MERKLE_BUCKETS = 64   # digest tree fan-out (one level is enough here)
MERKLE_MUT_MOD = 50   # ~1/50 of docs mutated into the "replica"


@register(
    "x_merkle_diff",
    # Bucket-digest replication diff (the rsync/anti-entropy pattern
    # a_table_checksum's single fingerprint scales INTO): both sides
    # fold rows into md5-keyed bucket digests (order-insensitive
    # bit_xor, so 1000 executors combine for free), the comparison
    # reads 2*B digests instead of 2*N rows, and only DIRTY buckets
    # are re-read to locate changes. The replica here is deterministic:
    # docs whose salted md5 lands on 0 mod 50 get their text mutated —
    # so dirty-bucket count, containment and read-amplification (rows
    # re-read per actually-changed row) are all exact, engine-equal
    # integers. At 100 TB: B sized so each bucket is a few files;
    # repeated rounds descend dirty buckets only (the Merkle tree —
    # one level shown, the recursion is the same digest fold).
    oracle=f"""
WITH base AS (
  SELECT doc_id, text,
         ('0x' || substr(md5('mkb|' || doc_id::VARCHAR), 1, 4))::BIGINT
           % {MERKLE_BUCKETS} AS bucket,
         (('0x' || substr(md5('mut|' || doc_id::VARCHAR), 1, 8))::BIGINT
           % {MERKLE_MUT_MOD}) = 0 AS mutated
  FROM documents
),
digests AS (
  SELECT bucket,
         count(*)::BIGINT AS n_rows,
         bit_xor(('0x' || substr(md5(doc_id::VARCHAR || '|' || text), 1, 15))::BIGINT)
           AS digest_base,
         bit_xor(('0x' || substr(md5(doc_id::VARCHAR || '|' ||
           CASE WHEN mutated THEN text || ' [edited]' ELSE text END), 1, 15))::BIGINT)
           AS digest_replica,
         sum(CASE WHEN mutated THEN 1 ELSE 0 END)::BIGINT AS n_changed
  FROM base GROUP BY bucket
)
SELECT count(*)::BIGINT AS n_buckets,
       count(*) FILTER (WHERE digest_base <> digest_replica)::BIGINT
         AS n_dirty_buckets,
       sum(n_rows) FILTER (WHERE digest_base <> digest_replica)::BIGINT
         AS n_rows_reread,
       sum(n_changed)::BIGINT AS n_rows_changed,
       sum(n_rows) FILTER (WHERE digest_base <> digest_replica)::DOUBLE
         / sum(n_changed) AS read_amplification
FROM digests
""",
    doc="Merkle-style bucket-digest diff between a table and a "
    "deterministically-mutated replica: md5-bucketed bit_xor digests "
    "(order-free partial folds), dirty-bucket detection, and the "
    "read-amplification bill for locating changed rows by re-reading "
    "dirty buckets only — the anti-entropy sync pattern that verifies "
    "a 100 TB copy with O(buckets) comparisons.",
    tags=("aggregates", "extension"),
)
def x_merkle_diff(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "text",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("mkb|"), F.col("doc_id").cast("string"))),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("long")
            % MERKLE_BUCKETS
        ).alias("bucket"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("mut|"), F.col("doc_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % MERKLE_MUT_MOD
            == 0
        ).alias("mutated"),
    )
    row_hash = (
        "cast(conv(substring(md5(concat(cast(doc_id as string), '|', {t})), "
        "1, 15), 16, 10) as bigint)"
    )
    replica_text = (
        "(case when mutated then text || ' [edited]' else text end)"
    )
    digests = base.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr(f"bit_xor({row_hash.format(t='text')})").alias("digest_base"),
        F.expr(f"bit_xor({row_hash.format(t=replica_text)})").alias(
            "digest_replica"
        ),
        F.sum(F.when(F.col("mutated"), 1).otherwise(0)).alias("n_changed"),
    )
    dirty = F.col("digest_base") != F.col("digest_replica")
    return digests.agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum(F.when(dirty, 1).otherwise(0)).cast("long").alias("n_dirty_buckets"),
        F.sum(F.when(dirty, F.col("n_rows"))).cast("long").alias("n_rows_reread"),
        F.sum("n_changed").cast("long").alias("n_rows_changed"),
        (
            F.sum(F.when(dirty, F.col("n_rows"))).cast("double")
            / F.sum("n_changed")
        ).alias("read_amplification"),
    )


@register(
    "a_l_diversity",
    # l-diversity census (Machanavajjhala 2007, public — the audit
    # k-anonymity alone misses): a k-anonymous equivalence class still
    # leaks its sensitive attribute if every member SHARES it
    # (homogeneity attack). Same quasi-identifier classes as
    # a_k_anonymity (nation, segment, balance bucket); the sensitive
    # attribute is the customer's order priority mix — a class's l is
    # its count of DISTINCT sensitive values, and classes with l=1
    # are leaks regardless of k. Two aggregates (per-class distinct
    # sensitive values via one (class, value) rollup, then the l-band
    # census); the class table stays bounded by the QI domain.
    oracle="""
WITH joined AS (
  SELECT c.c_nationkey, c.c_mktsegment,
         floor(c.c_acctbal / 1000)::BIGINT AS bal_bucket,
         o.o_orderpriority AS sensitive
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
),
classes AS (
  SELECT c_nationkey, c_mktsegment, bal_bucket,
         count(*)::BIGINT AS k,
         count(DISTINCT sensitive)::BIGINT AS l
  FROM joined GROUP BY 1, 2, 3
),
tot AS (SELECT sum(k)::BIGINT AS n FROM classes)
SELECT CASE WHEN l = 1 THEN 'a_l_eq_1'
            WHEN l = 2 THEN 'b_l_eq_2'
            ELSE 'c_l_3_plus' END AS l_band,
       count(*)::BIGINT AS n_classes,
       sum(k)::BIGINT AS n_rows,
       min(k)::BIGINT AS k_min,
       sum(k)::DOUBLE / (SELECT n FROM tot) AS row_share
FROM classes
GROUP BY 1
""",
    doc="l-diversity census over the k-anonymity quasi-identifier "
    "classes with order priority as the sensitive attribute: classes "
    "banded by distinct-sensitive-value count l, with row shares — "
    "the homogeneity-attack audit (an l=1 class leaks its sensitive "
    "value for every member no matter how large k is). Completes the "
    "privacy-governance pair with a_k_anonymity.",
    tags=("aggregates", "extension"),
)
def a_l_diversity(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    joined = cust.join(
        orders, orders.o_custkey == cust.c_custkey
    ).select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_bucket"),
        F.col("o_orderpriority").alias("sensitive"),
    )
    classes = (
        joined.groupBy("c_nationkey", "c_mktsegment", "bal_bucket")
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.countDistinct("sensitive").alias("l"),
        )
        .transform(lineage_cut_lazy)  # consumed by total + the band rollup
    )
    tot = classes.agg(F.sum("k").alias("n"))
    band = (
        F.when(F.col("l") == 1, "a_l_eq_1")
        .when(F.col("l") == 2, "b_l_eq_2")
        .otherwise("c_l_3_plus")
    )
    return (
        classes.select(band.alias("l_band"), "k")
        .groupBy("l_band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.sum("k").cast("long").alias("n_rows"),
            F.min("k").cast("long").alias("k_min"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "l_band",
            "n_classes",
            "n_rows",
            "k_min",
            (F.col("n_rows").cast("double") / F.col("n")).alias("row_share"),
        )
    )


MAD_K = 3.0          # outlier fence in MAD units
MAD_CONSISTENCY = 1.4826  # normal-consistency constant (public)


@register(
    "a_mad_outliers",
    # Robust outlier census via Median Absolute Deviation — the
    # fence that (unlike mean +/- k*sigma) a few wild points cannot
    # drag: med = median(value), MAD = median(|value - med|), outlier
    # iff |value - med| > 3 * 1.4826 * MAD. BOTH medians run through
    # the distributed exact-rank machinery (bucket counts locate the
    # target rank; only selected buckets sort — never a per-group
    # full-sort reducer), each median is the deterministic
    # lower-quantile element, and the fence comparison is one fixed
    # double expression — so the census is bit-equal in both engines.
    # Oracle: the naive two-window form.
    oracle=f"""
WITH med AS (
  SELECT event_type, value AS med FROM (
    SELECT event_type, value,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY value, event_id) AS rk,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM events
  ) WHERE rk = ((n - 1) * 2) // 4 + 1
),
dev AS (
  SELECT e.event_type, e.event_id, abs(e.value - m.med) AS d, m.med
  FROM events e JOIN med m ON m.event_type = e.event_type
),
mad AS (
  SELECT event_type, d AS mad, med FROM (
    SELECT event_type, d, med,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY d, event_id) AS rk,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM dev
  ) WHERE rk = ((n - 1) * 2) // 4 + 1
)
SELECT d.event_type,
       count(*)::BIGINT AS n_events,
       min(m.med) AS median_value,
       min(m.mad) AS mad,
       count(*) FILTER (WHERE d.d > {MAD_K} * {MAD_CONSISTENCY} * m.mad)::BIGINT
         AS n_outliers,
       (count(*) FILTER (WHERE d.d > {MAD_K} * {MAD_CONSISTENCY} * m.mad))::DOUBLE
         / count(*) AS outlier_share
FROM dev d JOIN mad m ON m.event_type = d.event_type
GROUP BY d.event_type
""",
    doc="MAD-based robust outlier census per event type: exact median "
    "and exact median-absolute-deviation via distributed rank "
    "selection (bucketed two-level — no per-group sort reducer), "
    "normal-consistency fence at 3 MAD units — the outlier gate that "
    "survives the outliers it hunts. Completes the robust-stats "
    "family with the winsorized mean and equi-depth histogram.",
    tags=("aggregates", "extension"),
)
def a_mad_outliers(spark, sf_dir):
    from ..operators.quantiles import exact_group_quantiles

    ev = load(spark, sf_dir, "events").select("event_type", "event_id", "value")
    med = exact_group_quantiles(
        ev,
        "event_type",
        "value",
        "event_id",
        [("p50", 2, 4)],
        F.floor(F.col("value") * 10).cast("long"),
    ).select("event_type", F.col("p50").alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "d", F.abs(F.col("value") - F.col("med"))
    ).transform(lineage_cut_lazy)  # second rank pass + the census
    mad = exact_group_quantiles(
        dev,
        "event_type",
        "d",
        "event_id",
        [("p50", 2, 4)],
        F.floor(F.col("d") * 10).cast("long"),
    ).select("event_type", F.col("p50").alias("mad"))
    fence = F.lit(MAD_K) * F.lit(MAD_CONSISTENCY) * F.col("mad")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min("med").alias("median_value"),
            F.min("mad").alias("mad"),
            F.sum(F.when(F.col("d") > fence, 1).otherwise(0))
            .cast("long")
            .alias("n_outliers"),
            (
                F.sum(F.when(F.col("d") > fence, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1))
            ).alias("outlier_share"),
        )
    )


@register(
    "x_pandas_udf_checksum",
    # The GROUPED_AGG pandas UDF face (the one Arrow UDF shape the
    # registry didn't exercise: scalar pandas UDFs, mapInPandas,
    # mapInArrow, applyInPandas, cogroup, applyInPandasWithState and
    # UDTFs all have faces already): a vectorized aggregate whose
    # kernel runs once per group over an Arrow-shipped pandas Series.
    # The aggregate is integer-exact (bit_xor of md5-derived row
    # hashes, the a_table_checksum fingerprint but per group), so the
    # Python-side fold is bit-equal to the oracle's SQL fold —
    # order-free XOR means partial aggregation order can never bite.
    oracle="""
SELECT o_orderstatus AS status,
       count(*)::BIGINT AS n_orders,
       bit_xor(('0x' || substr(md5(o_orderkey::VARCHAR || '|' ||
         o_orderpriority), 1, 15))::BIGINT)::BIGINT AS content_hash
FROM orders GROUP BY o_orderstatus
""",
    doc="Per-group content checksum through a GROUPED_AGG pandas UDF: "
    "the vectorized-aggregate API face, with an order-insensitive "
    "integer kernel (xor of md5 row hashes) so the Arrow-side fold is "
    "hash-equal to the SQL twin.",
    tags=("aggregates", "extension"),
)
def x_pandas_udf_checksum(spark, sf_dir):
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit functionType: type-hint inference would need pandas in
    # MODULE globals (get_type_hints evaluates there, not in locals)
    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def xor_agg(h):
        import functools

        return functools.reduce(lambda a, b: a ^ b, h.tolist(), 0)

    orders = load(spark, sf_dir, "orders")
    row_hash = F.expr(
        "cast(conv(substring(md5(concat(cast(o_orderkey as string), '|', "
        "o_orderpriority)), 1, 15), 16, 10) as bigint)"
    )
    hashed = orders.select(
        F.col("o_orderstatus").alias("status"), row_hash.alias("h")
    ).transform(lineage_cut_lazy)  # UDF agg + count agg
    # a GROUPED_AGG pandas UDF cannot mix with non-pandas aggregates in
    # one agg() (INVALID_PANDAS_UDF_PLACEMENT) — counts come from a
    # second aggregation over the few-row status key, joined broadcast
    sums = hashed.groupBy("status").agg(xor_agg("h").alias("content_hash"))
    counts = hashed.groupBy("status").agg(F.count(F.lit(1)).alias("n_orders"))
    return sums.join(F.broadcast(counts), "status").select(
        "status", "n_orders", "content_hash"
    )


@register(
    "a_gini_concentration",
    # Corpus-concentration report: the Gini coefficient of per-doc
    # token counts within each source — the one-number answer to "is
    # this source a few huge documents or many comparable ones", read
    # next to the mixture weights when balancing training data. Exact
    # rank formula G = 2*sum(i * x_i) / (n * sum x) - (n + 1)/n over
    # the value-sorted sequence; sum(i * x_i) is an exact integer, so
    # G is a fixed rational expression — bit-equal both engines. The
    # rank window partitions by source (never a global sort).
    oracle="""
WITH toks AS (
  SELECT source, doc_id, len(string_split(text, ' '))::BIGINT AS x
  FROM documents
),
ranked AS (
  SELECT source, x,
         row_number() OVER (PARTITION BY source ORDER BY x, doc_id) AS i,
         count(*) OVER (PARTITION BY source) AS n
  FROM toks
)
SELECT source,
       max(n)::BIGINT AS n_docs,
       sum(x)::BIGINT AS total_tokens,
       2.0 * sum(i * x) / (max(n) * sum(x))
         - (max(n) + 1.0) / max(n) AS gini
FROM ranked GROUP BY source
""",
    doc="Gini concentration of per-doc token counts WITHIN each source "
    "(exact sorted-rank formula, integer moments, per-source windows) "
    "— the within-source complement of x_gini_source_concentration's "
    "across-source mixture Gini: that one asks whether the CORPUS is "
    "balanced, this one whether each source is a few huge documents "
    "or many comparable ones.",
    tags=("aggregates", "extension"),
)
def a_gini_concentration(spark, sf_dir):
    from pyspark.sql import Window as W

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("x"),
    )
    w = W.partitionBy("source")
    ranked = toks.select(
        "source",
        "x",
        F.row_number().over(w.orderBy("x", "doc_id")).alias("i"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    return ranked.groupBy("source").agg(
        F.max("n").cast("long").alias("n_docs"),
        F.sum("x").cast("long").alias("total_tokens"),
        (
            F.lit(2.0) * F.sum(F.col("i") * F.col("x"))
            / (F.max("n") * F.sum("x"))
            - (F.max("n") + F.lit(1.0)) / F.max("n")
        ).alias("gini"),
    )


@register(
    "a_welch_ttest",
    # Welch's unequal-variance t-test (public textbook statistic; the
    # two-sample mean comparison that doesn't assume pooled variance):
    # weekend vs weekday event values per event type. Everything is
    # closed-form arithmetic over exact-decimal moments (sum, sum of
    # squares via dsum — the a_corr_matrix recipe): means, unbiased
    # variances, t = (m1-m2)/sqrt(v1/n1 + v2/n2), and the
    # Welch-Satterthwaite df. IEEE +,-,*,/,sqrt are bit-exact across
    # engines, so the doubles hash-match with no quantization. One
    # hash aggregate over the fact table; the test itself is per-group
    # O(1). Weekday split: Spark dayofweek is Sunday=1, DuckDB
    # dayofweek is Sunday=0 — mirrored explicitly.
    oracle=f"""
WITH s AS (
  SELECT event_type,
         CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS we,
         value
  FROM events
),
m AS (
  SELECT event_type,
         count(*) FILTER (WHERE we = 1)::BIGINT AS n1,
         count(*) FILTER (WHERE we = 0)::BIGINT AS n0,
         {dsum_sql('CASE WHEN we = 1 THEN value ELSE NULL END')} AS s1,
         {dsum_sql('CASE WHEN we = 0 THEN value ELSE NULL END')} AS s0,
         -- q0/q1 are sums of SQUARED values: ~2.4e9 at sf1, inside the
         -- 9e11 dsum envelope (functions/exact.py) up to ~sf300; past
         -- that, down-scale the squares (dsum(x*x*1e-4)*1e4 — the
         -- inverse of the small-sum 1e6 trick). (r10 ADVICE)
         {dsum_sql('CASE WHEN we = 1 THEN value * value ELSE NULL END')} AS q1,
         {dsum_sql('CASE WHEN we = 0 THEN value * value ELSE NULL END')} AS q0
  FROM s GROUP BY event_type
),
v AS (
  SELECT event_type, n1, n0,
         s1 / n1 AS mean_we, s0 / n0 AS mean_wd,
         (q1 - (s1 / n1) * s1) / (n1 - 1) AS v1,
         (q0 - (s0 / n0) * s0) / (n0 - 1) AS v0
  FROM m
)
SELECT event_type, n1 AS n_weekend, n0 AS n_weekday, mean_we, mean_wd,
       (mean_we - mean_wd) / sqrt(v1 / n1 + v0 / n0) AS t_stat,
       ((v1 / n1 + v0 / n0) * (v1 / n1 + v0 / n0))
         / ((v1 / n1) * (v1 / n1) / (n1 - 1)
            + (v0 / n0) * (v0 / n0) / (n0 - 1)) AS welch_df
FROM v ORDER BY event_type
""",
    doc="Welch's t-test (weekend vs weekday value, per event type): "
    "means/variances from exact-decimal moments, t statistic and "
    "Welch-Satterthwaite df as one fixed closed-form expression tree "
    "— bit-identical doubles in both engines, no quantization needed. "
    "Completes the hypothesis-test family (KS, chi-square, ANOVA).",
    tags=("aggregates", "stats", "extension"),
)
def a_welch_ttest(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    we = F.when(F.dayofweek("ts").isin(1, 7), 1).otherwise(0)
    s = ev.select("event_type", we.alias("we"), "value")
    m = s.groupBy("event_type").agg(
        F.count(F.when(F.col("we") == 1, 1)).alias("n1"),
        F.count(F.when(F.col("we") == 0, 1)).alias("n0"),
        dsum(F.when(F.col("we") == 1, F.col("value"))).alias("s1"),
        dsum(F.when(F.col("we") == 0, F.col("value"))).alias("s0"),
        dsum(F.when(F.col("we") == 1, F.col("value") * F.col("value"))).alias("q1"),
        dsum(F.when(F.col("we") == 0, F.col("value") * F.col("value"))).alias("q0"),
    )
    v = m.select(
        "event_type", "n1", "n0",
        (F.col("s1") / F.col("n1")).alias("mean_we"),
        (F.col("s0") / F.col("n0")).alias("mean_wd"),
        ((F.col("q1") - (F.col("s1") / F.col("n1")) * F.col("s1")) / (F.col("n1") - 1)).alias("v1"),
        ((F.col("q0") - (F.col("s0") / F.col("n0")) * F.col("s0")) / (F.col("n0") - 1)).alias("v0"),
    )
    se1 = F.col("v1") / F.col("n1")
    se0 = F.col("v0") / F.col("n0")
    return v.select(
        "event_type",
        F.col("n1").alias("n_weekend"),
        F.col("n0").alias("n_weekday"),
        "mean_we",
        "mean_wd",
        ((F.col("mean_we") - F.col("mean_wd")) / F.sqrt(se1 + se0)).alias("t_stat"),
        (
            ((se1 + se0) * (se1 + se0))
            / (se1 * se1 / (F.col("n1") - 1) + se0 * se0 / (F.col("n0") - 1))
        ).alias("welch_df"),
    ).orderBy("event_type")


PSI_BIN_W = 50   # fixed-width value bins (values span ~0-490 -> 10 bins)
PSI_BINS = 10


@register(
    "a_psi_drift",
    # Population Stability Index (the standard production drift
    # monitor for model inputs): per event type, compare the value
    # distribution of the FIRST half of the time range (baseline)
    # against the SECOND half (current). PSI = sum_i (p_i - q_i) *
    # ln(p_i / q_i) over fixed-width bins; add-one smoothing keeps
    # empty bins finite DETERMINISTICALLY (the common epsilon hack is
    # arbitrary; Laplace counts are exact rationals both engines
    # compute identically). ln quantized %.7f per bin (the 1-ulp
    # recipe) then exact-decimal summed — order-independent. The time
    # midpoint is an integer epoch-second computation broadcast from a
    # 1-row aggregate; everything else is two hash aggregates bounded
    # by types x bins. Conventional reading: PSI < 0.1 stable, > 0.25
    # action — reported as a band column.
    oracle=f"""
WITH b AS (
  SELECT event_type,
         CASE WHEN floor(epoch(ts))::BIGINT
                   < (SELECT (floor(epoch(min(ts)))::BIGINT
                              + floor(epoch(max(ts)))::BIGINT) // 2 FROM events)
              THEN 'base' ELSE 'cur' END AS half,
         least(floor(value / {PSI_BIN_W})::BIGINT, {PSI_BINS - 1}) AS bin
  FROM events
),
c0 AS (
  SELECT event_type, bin,
         count(*) FILTER (WHERE half = 'base')::BIGINT AS nb,
         count(*) FILTER (WHERE half = 'cur')::BIGINT AS nc
  FROM b GROUP BY 1, 2
),
-- full event_type x bin grid (r10 ADVICE): a bin empty in BOTH
-- halves still carries add-one mass 1/(t+BINS); dropping it would
-- make the smoothed shares sum below 1 and deviate from the
-- textbook smoothed-PSI definition.
grid AS (
  SELECT event_type, g.bin
  FROM (SELECT DISTINCT event_type FROM events)
  CROSS JOIN (SELECT unnest(range({PSI_BINS}))::BIGINT AS bin) g
),
c AS (
  SELECT grid.event_type, grid.bin,
         coalesce(nb, 0) AS nb, coalesce(nc, 0) AS nc
  FROM grid LEFT JOIN c0
    ON grid.event_type = c0.event_type AND grid.bin = c0.bin
),
tot AS (
  SELECT event_type, sum(nb)::BIGINT AS tb, sum(nc)::BIGINT AS tc
  FROM c GROUP BY 1
),
terms AS (
  SELECT c.event_type,
         (nb + 1)::DOUBLE / (tb + {PSI_BINS}) AS p,
         (nc + 1)::DOUBLE / (tc + {PSI_BINS}) AS q
  FROM c JOIN tot ON c.event_type = tot.event_type
),
psi AS (
  SELECT event_type,
         -- summands are ~1e-3: scale 1e6 through the exact-decimal
         -- sum so dsum's 4-dp rounding lands at the 10th decimal of
         -- the unscaled value (dsum(small) alone would truncate PSI
         -- to 2 significant figures)
         {dsum_sql("(q - p) * printf('%.7f', ln(q / p))::DOUBLE * 1e6")} / 1e6
           AS psi
  FROM terms GROUP BY event_type
)
SELECT event_type, psi,
       CASE WHEN psi < 0.1 THEN 'stable'
            WHEN psi < 0.25 THEN 'moderate'
            ELSE 'action' END AS psi_band
FROM psi ORDER BY event_type
""",
    doc="Population Stability Index per event type between the first "
    "and second half of the time range: fixed-width value bins, "
    "add-one-smoothed shares (deterministic, no epsilon hack), ln "
    "quantized %.7f per bin, exact-decimal term sum. The standard "
    "input-drift monitor a training pipeline runs per feature per "
    "ingest; bounded by types x bins after two hash aggregates.",
    tags=("aggregates", "stats", "extension"),
)
def a_psi_drift(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    mid = ev.agg(
        (
            (F.floor(F.unix_timestamp(F.min("ts"))).cast("long")
             + F.floor(F.unix_timestamp(F.max("ts"))).cast("long")) / 2
        ).cast("long").alias("mid_epoch")
    )
    b = ev.crossJoin(F.broadcast(mid)).select(
        "event_type",
        F.when(
            F.unix_timestamp("ts").cast("long") < F.col("mid_epoch"), "base"
        ).otherwise("cur").alias("half"),
        F.least(
            F.floor(F.col("value") / PSI_BIN_W).cast("long"), F.lit(PSI_BINS - 1)
        ).alias("bin"),
    )
    c0 = b.groupBy("event_type", "bin").agg(
        F.count(F.when(F.col("half") == "base", 1)).alias("nb"),
        F.count(F.when(F.col("half") == "cur", 1)).alias("nc"),
    )
    # full event_type x bin grid (r10 ADVICE): bins empty in both
    # halves still carry add-one mass — without them the smoothed
    # shares don't sum to 1. The grid is types x PSI_BINS rows,
    # broadcast-sized by construction.
    grid = (
        ev.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(F.sequence(F.lit(0), F.lit(PSI_BINS - 1))).alias("bin"),
        )
        .select("event_type", F.col("bin").cast("long").alias("bin"))
    )
    c = grid.join(c0, ["event_type", "bin"], "left").select(
        "event_type",
        "bin",
        F.coalesce("nb", F.lit(0)).alias("nb"),
        F.coalesce("nc", F.lit(0)).alias("nc"),
    )
    tot = c.groupBy("event_type").agg(
        F.sum("nb").alias("tb"), F.sum("nc").alias("tc")
    )
    terms = c.join(tot, "event_type").select(
        "event_type",
        ((F.col("nb") + 1).cast("double") / (F.col("tb") + PSI_BINS)).alias("p"),
        ((F.col("nc") + 1).cast("double") / (F.col("tc") + PSI_BINS)).alias("q"),
    )
    lnq = F.format_string("%.7f", F.log(F.col("q") / F.col("p"))).cast("double")
    # summands ~1e-3: scale 1e6 through dsum (whose 4-dp decimal
    # rounding would otherwise truncate PSI to 2 significant figures)
    psi = terms.groupBy("event_type").agg(
        (dsum((F.col("q") - F.col("p")) * lnq * F.lit(1e6)) / 1e6).alias("psi")
    )
    return psi.select(
        "event_type",
        "psi",
        F.when(F.col("psi") < 0.1, "stable")
        .when(F.col("psi") < 0.25, "moderate")
        .otherwise("action")
        .alias("psi_band"),
    ).orderBy("event_type")


TCLOSE_BANDS = 5  # ordered sensitive-attribute bands (balance quintile-ish)


@register(
    "a_t_closeness",
    # t-closeness (Li, Li, Venkatasubramanian, ICDE 2007 — the third
    # leg of the release-audit trio after k-anonymity and
    # l-diversity): a quasi-identifier class leaks if the DISTRIBUTION
    # of the sensitive attribute inside the class strays from the
    # global distribution, even when the class is large (k) and
    # diverse (l). For an ORDERED sensitive attribute the Earth
    # Mover's Distance has the closed form EMD = (1/(m-1)) *
    # sum_{i<m} |r_i| with r_i the prefix sums of (p_i - q_i); with
    # m = 5 bands that is a FIXED expression tree over ten exact
    # rationals — no quantization, bit-identical doubles. QI classes =
    # (nation, segment); sensitive = account-balance band. Two hash
    # aggregates (class x band counts, global band counts broadcast);
    # the class table is bounded by the QI domain at any fact size.
    oracle=f"""
WITH base AS (
  SELECT c_nationkey, c_mktsegment,
         least(floor((c_acctbal + 1000) / 2200)::BIGINT, {TCLOSE_BANDS - 1})
           AS band
  FROM customer
),
cls AS (
  SELECT c_nationkey, c_mktsegment,
         count(*)::BIGINT AS n_rows,
         count(*) FILTER (WHERE band = 0)::BIGINT AS b0,
         count(*) FILTER (WHERE band = 1)::BIGINT AS b1,
         count(*) FILTER (WHERE band = 2)::BIGINT AS b2,
         count(*) FILTER (WHERE band = 3)::BIGINT AS b3,
         count(*) FILTER (WHERE band = 4)::BIGINT AS b4
  FROM base GROUP BY 1, 2
),
g AS (
  SELECT count(*)::BIGINT AS n,
         count(*) FILTER (WHERE band = 0)::BIGINT AS g0,
         count(*) FILTER (WHERE band = 1)::BIGINT AS g1,
         count(*) FILTER (WHERE band = 2)::BIGINT AS g2,
         count(*) FILTER (WHERE band = 3)::BIGINT AS g3,
         count(*) FILTER (WHERE band = 4)::BIGINT AS g4
  FROM base
),
emd AS (
  SELECT c_nationkey, c_mktsegment, n_rows,
         (abs((b0::DOUBLE / n_rows - g0::DOUBLE / n))
          + abs((b0::DOUBLE / n_rows - g0::DOUBLE / n)
                + (b1::DOUBLE / n_rows - g1::DOUBLE / n))
          + abs((b0::DOUBLE / n_rows - g0::DOUBLE / n)
                + (b1::DOUBLE / n_rows - g1::DOUBLE / n)
                + (b2::DOUBLE / n_rows - g2::DOUBLE / n))
          + abs((b0::DOUBLE / n_rows - g0::DOUBLE / n)
                + (b1::DOUBLE / n_rows - g1::DOUBLE / n)
                + (b2::DOUBLE / n_rows - g2::DOUBLE / n)
                + (b3::DOUBLE / n_rows - g3::DOUBLE / n)))
           / {TCLOSE_BANDS - 1} AS emd
  FROM cls, g
)
SELECT c_nationkey::BIGINT AS nationkey, c_mktsegment AS segment,
       n_rows, emd,
       CASE WHEN emd <= 0.15 THEN 'releasable_t_015'
            WHEN emd <= 0.25 THEN 'review_t_025'
            ELSE 'blocked' END AS t_band
FROM emd ORDER BY nationkey, segment
""",
    doc="t-closeness audit over (nation, segment) QI classes with the "
    "account-balance band as ordered sensitive attribute: per-class "
    "EMD to the global distribution via the closed-form ordered-EMD "
    "prefix sums (m=5, fixed expression tree, exact doubles), banded "
    "by the conventional t thresholds. Completes the privacy trio "
    "with a_k_anonymity and a_l_diversity.",
    tags=("aggregates", "privacy", "extension"),
)
def a_t_closeness(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    base = cust.select(
        "c_nationkey",
        "c_mktsegment",
        F.least(
            F.floor((F.col("c_acctbal") + 1000) / 2200).cast("long"),
            F.lit(TCLOSE_BANDS - 1),
        ).alias("band"),
    )
    band_counts = [
        F.count(F.when(F.col("band") == k, 1)).alias(f"b{k}")
        for k in range(TCLOSE_BANDS)
    ]
    cls = base.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_rows"), *band_counts
    )
    g = base.agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.count(F.when(F.col("band") == k, 1)).alias(f"g{k}")
            for k in range(TCLOSE_BANDS)
        ],
    )
    j = cls.crossJoin(F.broadcast(g))
    d = [
        F.col(f"b{k}").cast("double") / F.col("n_rows")
        - F.col(f"g{k}").cast("double") / F.col("n")
        for k in range(TCLOSE_BANDS)
    ]
    # prefix sums r_1..r_{m-1}, LEFT-associated exactly as the oracle
    prefixes = []
    acc = d[0]
    prefixes.append(F.abs(acc))
    for k in range(1, TCLOSE_BANDS - 1):
        acc = acc + d[k]
        prefixes.append(F.abs(acc))
    emd_expr = prefixes[0]
    for p in prefixes[1:]:
        emd_expr = emd_expr + p
    emd_expr = (emd_expr / (TCLOSE_BANDS - 1)).alias("emd")
    out = j.select(
        F.col("c_nationkey").cast("long").alias("nationkey"),
        F.col("c_mktsegment").alias("segment"),
        "n_rows",
        emd_expr,
    )
    return out.select(
        "nationkey",
        "segment",
        "n_rows",
        "emd",
        F.when(F.col("emd") <= 0.15, "releasable_t_015")
        .when(F.col("emd") <= 0.25, "review_t_025")
        .otherwise("blocked")
        .alias("t_band"),
    ).orderBy("nationkey", "segment")


CAPTURE_MOD_A = 5   # sample A: ~1/5 of docs by one hash gate
CAPTURE_MOD_B = 7   # sample B: ~1/7 by an independent gate


@register(
    "a_capture_recapture",
    # Chapman's capture-recapture estimator (public ecology/statistics
    # method; in data engineering it's how you estimate TOTAL corpus /
    # web size from two independent crawls' overlap without ever
    # counting the whole thing): draw two independent deterministic
    # samples via md5 gates with coprime moduli, count the overlap,
    # and estimate N_hat = (n1+1)(n2+1)/(m+1) - 1. The estimate, its
    # standard error, and the true N (known here — that's the eval)
    # are all exact integer/rational arithmetic. Sampling gates are
    # scan filters (no shuffle); the overlap is one aggregate. The
    # same pattern estimates dedup-cluster counts or join sizes from
    # samples at 100 TB, where the exact count is a full pass you'd
    # rather not pay.
    oracle=f"""
WITH tagged AS (
  SELECT doc_id,
         (('0x' || substr(md5('capA|' || doc_id::VARCHAR), 1, 8))::BIGINT
           % {CAPTURE_MOD_A}) = 0 AS in_a,
         (('0x' || substr(md5('capB|' || doc_id::VARCHAR), 1, 8))::BIGINT
           % {CAPTURE_MOD_B}) = 0 AS in_b
  FROM documents
),
m AS (
  SELECT count(*)::BIGINT AS n_true,
         count(*) FILTER (WHERE in_a)::BIGINT AS n1,
         count(*) FILTER (WHERE in_b)::BIGINT AS n2,
         count(*) FILTER (WHERE in_a AND in_b)::BIGINT AS m_overlap
  FROM tagged
)
SELECT n_true, n1, n2, m_overlap,
       (n1 + 1)::DOUBLE * (n2 + 1) / (m_overlap + 1) - 1 AS n_chapman,
       sqrt((n1 + 1)::DOUBLE * (n2 + 1) * (n1 - m_overlap) * (n2 - m_overlap)
            / ((m_overlap + 1)::DOUBLE * (m_overlap + 1) * (m_overlap + 2)))
         AS stderr,
       ((n1 + 1)::DOUBLE * (n2 + 1) / (m_overlap + 1) - 1 - n_true)
         / n_true AS rel_error
FROM m
""",
    doc="Chapman capture-recapture corpus-size estimate from two "
    "independent md5-gated samples (coprime moduli): N_hat = "
    "(n1+1)(n2+1)/(m+1)-1 with its standard error, evaluated against "
    "the true count — the crawl-overlap size-estimation trick, as an "
    "eval-as-query. Scan-filter sampling, one aggregate, exact "
    "rationals.",
    tags=("aggregates", "stats", "extension"),
)
def a_capture_recapture(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")

    def gate(salt, mod):
        return (
            F.conv(F.substring(F.md5(F.concat(F.lit(salt), F.col("doc_id").cast("string"))), 1, 8), 16, 10)
            .cast("long") % mod == 0
        )

    tagged = docs.select(
        "doc_id",
        gate("capA|", CAPTURE_MOD_A).alias("in_a"),
        gate("capB|", CAPTURE_MOD_B).alias("in_b"),
    )
    m = tagged.agg(
        F.count(F.lit(1)).alias("n_true"),
        F.count(F.when(F.col("in_a"), 1)).alias("n1"),
        F.count(F.when(F.col("in_b"), 1)).alias("n2"),
        F.count(F.when(F.col("in_a") & F.col("in_b"), 1)).alias("m_overlap"),
    )
    nh = (F.col("n1") + 1).cast("double") * (F.col("n2") + 1) / (F.col("m_overlap") + 1) - 1
    return m.select(
        "n_true", "n1", "n2", "m_overlap",
        nh.alias("n_chapman"),
        F.sqrt(
            (F.col("n1") + 1).cast("double") * (F.col("n2") + 1)
            * (F.col("n1") - F.col("m_overlap")) * (F.col("n2") - F.col("m_overlap"))
            / (
                (F.col("m_overlap") + 1).cast("double")
                * (F.col("m_overlap") + 1) * (F.col("m_overlap") + 2)
            )
        ).alias("stderr"),
        ((nh - F.col("n_true")) / F.col("n_true")).alias("rel_error"),
    )


@register(
    "a_theil_decomposition",
    # Theil T index with between/within decomposition (public
    # econometrics; the reason to prefer Theil over Gini for corpus
    # audits is exactly this ADDITIVITY): total token inequality =
    # inequality BETWEEN sources + the source-share-weighted
    # inequality WITHIN each source. T = mean over docs of
    # (x/mu) * ln(x/mu). All shares are exact rationals; ln is
    # quantized %.7f per evaluation (the 1-ulp recipe), so each of
    # the three reported measures is engine-exact — the additive
    # identity T_total = T_between + sum_s w_s T_s holds only up to
    # the ln quantization (|residual| < ~1e-6, reported as its own
    # column so the near-zero check is part of the gated output).
    # Two hash aggregates; the doc-grain pass computes each doc's
    # term in one scan.
    oracle=f"""
WITH docs_t AS (
  SELECT doc_id, source,
         len(string_split(text, ' '))::BIGINT AS x
  FROM documents
),
g AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS tot FROM docs_t),
src AS (
  SELECT source, count(*)::BIGINT AS ns, sum(x)::BIGINT AS ts
  FROM docs_t GROUP BY source
),
tot AS (
  -- Theil terms are small; every dsum here carries a 1e6 scale so
  -- the 4-dp decimal rounding lands at the 10th decimal unscaled
  SELECT {dsum_sql("(x::DOUBLE * n / tot) * printf('%.7f', ln(x::DOUBLE * n / tot))::DOUBLE * 1e6")} / 1e6 / any_value(n)
           AS t_total
  FROM docs_t, g
),
within AS (
  SELECT d.source,
         {dsum_sql("(d.x::DOUBLE * s.ns / s.ts) * printf('%.7f', ln(d.x::DOUBLE * s.ns / s.ts))::DOUBLE * 1e6")} / 1e6 / any_value(s.ns)
           AS t_s,
         any_value(s.ts) AS ts
  FROM docs_t d JOIN src s ON d.source = s.source
  GROUP BY d.source
),
parts AS (
  SELECT {dsum_sql("(w.ts::DOUBLE / g.tot) * w.t_s * 1e6")} / 1e6 AS t_within,
         {dsum_sql("(s.ts::DOUBLE / g.tot) * printf('%.7f', ln((s.ts::DOUBLE / g.tot) / (s.ns::DOUBLE / g.n)))::DOUBLE * 1e6")} / 1e6 AS t_between
  FROM within w JOIN src s ON w.source = s.source, g
)
SELECT t_total, t_between, t_within,
       t_total - t_between - t_within AS additivity_residual
FROM tot, parts
""",
    doc="Theil T inequality of doc token counts with the "
    "between-source / within-source decomposition — the additive "
    "inequality audit (Gini cannot be decomposed this way): which "
    "share of corpus imbalance is source mix vs within-source "
    "skew. Exact rational shares, %.7f-quantized ln, and the "
    "additivity residual reported (bounded by quantization, near "
    "zero) as part of the gated output.",
    tags=("aggregates", "stats", "extension"),
)
def a_theil_decomposition(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    docs_t = docs.select(
        "doc_id", "source", F.size(F.split("text", " ")).cast("long").alias("x")
    ).transform(lineage_cut_lazy)  # global + per-source passes
    g = docs_t.agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("tot")
    )

    def lnq(col):
        return F.format_string("%.7f", F.log(col)).cast("double")

    ratio_g = F.col("x").cast("double") * F.col("n") / F.col("tot")
    # small summands: 1e6 scale through every dsum (see oracle note)
    tot = (
        docs_t.crossJoin(F.broadcast(g))
        .agg(
            (dsum(ratio_g * lnq(ratio_g) * F.lit(1e6)) / 1e6 / F.first("n")).alias(
                "t_total"
            )
        )
    )
    src = docs_t.groupBy("source").agg(
        F.count(F.lit(1)).alias("ns"), F.sum("x").alias("ts")
    )
    ratio_s = F.col("x").cast("double") * F.col("ns") / F.col("ts")
    within = (
        docs_t.join(F.broadcast(src), "source")
        .groupBy("source")
        .agg(
            (dsum(ratio_s * lnq(ratio_s) * F.lit(1e6)) / 1e6 / F.first("ns")).alias(
                "t_s"
            ),
            F.first("ts").alias("ts"),
        )
    )
    share = F.col("ts").cast("double") / F.col("tot")
    share_n = (F.col("ts").cast("double") / F.col("tot")) / (
        F.col("ns").cast("double") / F.col("n")
    )
    parts = (
        within.join(F.broadcast(src.select("source", "ns")), "source")
        .crossJoin(F.broadcast(g))
        .agg(
            (dsum(share * F.col("t_s") * F.lit(1e6)) / 1e6).alias("t_within"),
            (dsum(share * lnq(share_n) * F.lit(1e6)) / 1e6).alias("t_between"),
        )
    )
    return tot.crossJoin(F.broadcast(parts)).select(
        "t_total",
        "t_between",
        "t_within",
        (F.col("t_total") - F.col("t_between") - F.col("t_within")).alias(
            "additivity_residual"
        ),
    )


@register(
    "a_mannwhitney_u",
    # Mann-Whitney U / Wilcoxon rank-sum (public textbook): the
    # NONPARAMETRIC twin of a_welch_ttest, deliberately run on the
    # SAME weekend-vs-weekday split so the two tests are comparable
    # side by side. Everything is exact rational arithmetic until one
    # final sqrt: tied-value groups get average ranks computed from
    # per-distinct-value counts and a prefix sum PARTITIONED by event
    # type (avg rank = prev_cum + (cnt+1)/2 — an exact .0/.5 value),
    # R1 = sum of n1_v * avg_rank_v is a decimal-exact sum, and the
    # normal approximation uses the tie-corrected variance
    # sigma^2 = (n1*n2/12) * ((n+1) - sum(t^3-t)/(n*(n-1))). Two hash
    # aggregates + one partitioned window over the distinct-value
    # table (bounded by value cardinality, not rows).
    oracle=f"""
WITH s AS (
  SELECT event_type,
         CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS we,
         value
  FROM events
),
vals AS (
  SELECT event_type, value,
         count(*)::BIGINT AS cnt,
         sum(CASE WHEN we = 1 THEN 1 ELSE 0 END)::BIGINT AS n1v,
         floor(value)::BIGINT AS bkt
  FROM s GROUP BY 1, 2
),
-- two-level prefix sum (the a_ks_two_sample discipline): exact
-- because floor(value) is a PREFIX of the value ordering; the outer
-- window runs over the tiny per-type bucket table, the local window
-- is partitioned by (type, bucket) — no coarse-keyed giant partition
bt AS (SELECT event_type, bkt, sum(cnt)::BIGINT AS bc FROM vals GROUP BY 1, 2),
off AS (
  SELECT event_type, bkt,
         coalesce(sum(bc) OVER (PARTITION BY event_type ORDER BY bkt
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS off_c
  FROM bt
),
ranked AS (
  SELECT v.event_type, v.value, v.cnt, v.n1v,
         off.off_c + coalesce(sum(v.cnt) OVER (
             PARTITION BY v.event_type, v.bkt ORDER BY v.value
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS prev_cum
  FROM vals v JOIN off ON v.event_type = off.event_type AND v.bkt = off.bkt
),
m AS (
  SELECT event_type,
         sum(n1v)::BIGINT AS n1,
         sum(cnt - n1v)::BIGINT AS n2,
         {dsum_sql('n1v * (prev_cum + (cnt + 1) / 2.0)')} AS r1,
         sum(cnt::HUGEINT * cnt * cnt - cnt)::DOUBLE AS tie_sum
  FROM ranked GROUP BY event_type
)
SELECT event_type, n1 AS n_weekend, n2 AS n_weekday,
       r1 - n1 * (n1 + 1) / 2.0 AS u_stat,
       (r1 - n1 * (n1 + 1) / 2.0 - n1 * n2 / 2.0)
         / sqrt((n1::DOUBLE * n2 / 12.0)
                * ((n1 + n2 + 1) - tie_sum::DOUBLE
                   / ((n1 + n2) * (n1 + n2 - 1.0)))) AS z_approx
FROM m ORDER BY event_type
""",
    doc="Mann-Whitney U rank-sum test (weekend vs weekday value per "
    "event type — the same split as a_welch_ttest, nonparametric "
    "twin): tie-averaged ranks from a partitioned prefix sum over the "
    "distinct-value table, exact-decimal rank sum, tie-corrected "
    "normal z — rational arithmetic end to end, one IEEE sqrt.",
    tags=("aggregates", "stats", "extension"),
)
def a_mannwhitney_u(spark, sf_dir):
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    we = F.when(F.dayofweek("ts").isin(1, 7), 1).otherwise(0)
    s = ev.select("event_type", we.alias("we"), "value")
    vals = s.groupBy("event_type", "value").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.when(F.col("we") == 1, 1).otherwise(0)).alias("n1v"),
    ).withColumn("bkt", F.floor("value").cast("long"))
    # two-level prefix sum (a_ks_two_sample discipline): per-type
    # value partitions don't parallelize at 100 TB with 5 types, but
    # the bucket offset table is tiny and the local window is keyed
    # by (type, bucket)
    bt = vals.groupBy("event_type", "bkt").agg(F.sum("cnt").alias("bc"))
    w_b = (
        W.partitionBy("event_type").orderBy("bkt")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    off = bt.select(
        "event_type", "bkt",
        F.coalesce(F.sum("bc").over(w_b), F.lit(0)).alias("off_c"),
    )
    w_l = (
        W.partitionBy("event_type", "bkt").orderBy("value")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    ranked = vals.join(F.broadcast(off), ["event_type", "bkt"]).select(
        "event_type",
        "value",
        "cnt",
        "n1v",
        (
            F.col("off_c") + F.coalesce(F.sum("cnt").over(w_l), F.lit(0))
        ).alias("prev_cum"),
    )
    m = ranked.groupBy("event_type").agg(
        F.sum("n1v").alias("n1"),
        F.sum(F.col("cnt") - F.col("n1v")).alias("n2"),
        dsum(F.col("n1v") * (F.col("prev_cum") + (F.col("cnt") + 1) / 2.0)).alias("r1"),
        # t^3 in int64 wraps silently once one value's cnt > ~2.09e6
        # (Spark non-ANSI) while DuckDB errors — so the cube runs in
        # exact decimal(38,0) (Spark) / HUGEINT (DuckDB): both exact to
        # ~1e38, and the final double cast is correctly rounded in both
        # engines (bit-parity verified past 2^53 in the r12 probe).
        F.sum(
            F.col("cnt").cast("decimal(38,0)") * F.col("cnt") * F.col("cnt")
            - F.col("cnt")
        ).cast("double").alias("tie_sum"),
    )
    u = F.col("r1") - F.col("n1") * (F.col("n1") + 1) / 2.0
    n = F.col("n1") + F.col("n2")
    sigma = F.sqrt(
        (F.col("n1").cast("double") * F.col("n2") / 12.0)
        * (
            (n + 1)
            - F.col("tie_sum").cast("double") / (n * (n - 1.0))
        )
    )
    return m.select(
        "event_type",
        F.col("n1").alias("n_weekend"),
        F.col("n2").alias("n_weekday"),
        u.alias("u_stat"),
        ((u - F.col("n1") * F.col("n2") / 2.0) / sigma).alias("z_approx"),
    ).orderBy("event_type")


KAPPA_Q_LOW, KAPPA_Q_MID = 0.635, 0.655   # quality-score band cuts
KAPPA_R_LOW, KAPPA_R_MID = 0.105, 0.085   # top-word-share band cuts


@register(
    "a_cohens_kappa",
    # Cohen's kappa (public 1960 statistic — the inter-rater
    # agreement number every annotation pipeline reports; the
    # reference's own domain is annotation verification): two
    # independent document-quality "raters" band every doc
    # low/mid/high — rater A is the Gopher/C4 composite quality score
    # (operators/text.quality_score, mirrored term-for-term in SQL),
    # rater B is top-word dominance (max word count / doc length, the
    # repetition signal). kappa = (po - pe)/(1 - pe) with pe from the
    # marginal shares — all exact integer counts and fixed-order
    # double divisions, no quantization. Two hash aggregates (word
    # counts, then the 1-row contingency summary). The honest reading
    # on this synthetic corpus: both raters measure *different* text
    # properties, so kappa should sit near 0 (chance-level agreement)
    # — which is exactly what an agreement audit is for.
    oracle=f"""
WITH d AS (
  SELECT doc_id, text, string_split(lower(text), ' ') AS w
  FROM documents
),
qa AS (
  SELECT doc_id,
         CASE WHEN ((CASE WHEN len(w) >= 20 AND len(w) <= 400 THEN 1.0 ELSE 0.0 END) * 0.4          + least(len(list_filter(w, w -> list_contains(['the', 'a', 'of', 'and', 'to', 'in', 'is'], w)))::DOUBLE / len(w)::DOUBLE * 2.0, 1.0) * 0.4          + (1.0 - least(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))::DOUBLE / length(text)::DOUBLE * 10.0, 1.0)) * 0.2) <= {KAPPA_Q_LOW} THEN 'low'
              WHEN ((CASE WHEN len(w) >= 20 AND len(w) <= 400 THEN 1.0 ELSE 0.0 END) * 0.4          + least(len(list_filter(w, w -> list_contains(['the', 'a', 'of', 'and', 'to', 'in', 'is'], w)))::DOUBLE / len(w)::DOUBLE * 2.0, 1.0) * 0.4          + (1.0 - least(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))::DOUBLE / length(text)::DOUBLE * 10.0, 1.0)) * 0.2) <= {KAPPA_Q_MID} THEN 'mid'
              ELSE 'high' END AS band_a
  FROM d
),
tw AS (
  SELECT doc_id, max(c)::DOUBLE / any_value(n) AS top_share
  FROM (SELECT doc_id, word, count(*)::BIGINT AS c, any_value(n) AS n
        FROM (SELECT doc_id, unnest(w) AS word, len(w) AS n FROM d)
        GROUP BY doc_id, word)
  GROUP BY doc_id
),
qb AS (
  SELECT doc_id,
         CASE WHEN top_share > {KAPPA_R_LOW} THEN 'low'
              WHEN top_share > {KAPPA_R_MID} THEN 'mid'
              ELSE 'high' END AS band_b
  FROM tw
),
m AS (
  SELECT count(*)::BIGINT AS n,
         sum(CASE WHEN band_a = band_b THEN 1 ELSE 0 END)::BIGINT AS agree,
         sum(CASE WHEN band_a = 'low' THEN 1 ELSE 0 END)::BIGINT AS ra_low,
         sum(CASE WHEN band_a = 'mid' THEN 1 ELSE 0 END)::BIGINT AS ra_mid,
         sum(CASE WHEN band_a = 'high' THEN 1 ELSE 0 END)::BIGINT AS ra_high,
         sum(CASE WHEN band_b = 'low' THEN 1 ELSE 0 END)::BIGINT AS rb_low,
         sum(CASE WHEN band_b = 'mid' THEN 1 ELSE 0 END)::BIGINT AS rb_mid,
         sum(CASE WHEN band_b = 'high' THEN 1 ELSE 0 END)::BIGINT AS rb_high
  FROM qa JOIN qb USING (doc_id)
)
SELECT n, agree,
       agree::DOUBLE / n AS po,
       (ra_low::DOUBLE / n * (rb_low::DOUBLE / n)
        + ra_mid::DOUBLE / n * (rb_mid::DOUBLE / n)
        + ra_high::DOUBLE / n * (rb_high::DOUBLE / n)) AS pe,
       (agree::DOUBLE / n
        - (ra_low::DOUBLE / n * (rb_low::DOUBLE / n)
           + ra_mid::DOUBLE / n * (rb_mid::DOUBLE / n)
           + ra_high::DOUBLE / n * (rb_high::DOUBLE / n)))
       / (1 - (ra_low::DOUBLE / n * (rb_low::DOUBLE / n)
               + ra_mid::DOUBLE / n * (rb_mid::DOUBLE / n)
               + ra_high::DOUBLE / n * (rb_high::DOUBLE / n))) AS kappa
FROM m
""",
    doc="Cohen's kappa between two document-quality raters (composite "
    "quality score vs top-word dominance, banded low/mid/high): "
    "observed vs chance agreement from exact integer marginals, one "
    "fixed closed-form expression — the inter-annotator agreement "
    "audit of labeling pipelines. Near-zero kappa here is the honest "
    "reading: the raters measure different properties.",
    tags=("aggregates", "stats", "extension"),
)
def a_cohens_kappa(spark, sf_dir):
    from ..operators.text import quality_score

    docs = load(spark, sf_dir, "documents").withColumn(
        "w", F.split(F.lower("text"), " ")
    )
    q = quality_score("w", F.col("text"))
    qa = docs.select(
        "doc_id",
        F.when(q <= KAPPA_Q_LOW, "low")
        .when(q <= KAPPA_Q_MID, "mid")
        .otherwise("high")
        .alias("band_a"),
    )
    words = docs.select(
        "doc_id", F.size("w").cast("long").alias("n"), F.explode("w").alias("word")
    )
    wc = words.groupBy("doc_id", "word").agg(
        F.count(F.lit(1)).alias("c"), F.first("n").alias("n")
    )
    tw = wc.groupBy("doc_id").agg(
        (F.max("c").cast("double") / F.first("n")).alias("top_share")
    )
    qb = tw.select(
        "doc_id",
        F.when(F.col("top_share") > KAPPA_R_LOW, "low")
        .when(F.col("top_share") > KAPPA_R_MID, "mid")
        .otherwise("high")
        .alias("band_b"),
    )
    j = qa.join(qb, "doc_id")

    def cnt(col, v):
        return F.sum(F.when(F.col(col) == v, 1).otherwise(0))

    m = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("band_a") == F.col("band_b"), 1).otherwise(0)).alias(
            "agree"
        ),
        cnt("band_a", "low").alias("ra_low"),
        cnt("band_a", "mid").alias("ra_mid"),
        cnt("band_a", "high").alias("ra_high"),
        cnt("band_b", "low").alias("rb_low"),
        cnt("band_b", "mid").alias("rb_mid"),
        cnt("band_b", "high").alias("rb_high"),
    )
    nn = F.col("n")
    pe = (
        F.col("ra_low").cast("double") / nn * (F.col("rb_low").cast("double") / nn)
        + F.col("ra_mid").cast("double") / nn * (F.col("rb_mid").cast("double") / nn)
        + F.col("ra_high").cast("double") / nn * (F.col("rb_high").cast("double") / nn)
    )
    po = F.col("agree").cast("double") / nn
    return m.select(
        "n",
        "agree",
        po.alias("po"),
        pe.alias("pe"),
        ((po - pe) / (1 - pe)).alias("kappa"),
    )


@register(
    "a_roc_auc",
    # ROC AUC by the rank statistic (public identity: AUC = U/(n1*n0)
    # with U the Mann-Whitney statistic — Hanley & McNeil 1982): how
    # well does `value` separate purchases from clicks? Tie-averaged
    # ranks come from the same two-level bucket-prefix machinery as
    # a_mannwhitney_u (exact .0/.5 rationals, no giant single-series
    # sort partition); the rank sum rides the exact-decimal path; AUC
    # and the Gini/accuracy-ratio (2*AUC-1) are single IEEE divisions.
    # This is THE eval number for a binary scorer over a 100 TB event
    # log, computed with two hash aggregates + windows over the
    # distinct-value table (bounded by value cardinality, not rows).
    oracle=f"""
WITH s AS (
  SELECT value, CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events WHERE event_type IN ('click', 'purchase')
),
vals AS (
  SELECT value, count(*)::BIGINT AS cnt,
         sum(y)::BIGINT AS n1v,
         floor(value)::BIGINT AS bkt
  FROM s GROUP BY 1
),
bt AS (SELECT bkt, sum(cnt)::BIGINT AS bc FROM vals GROUP BY 1),
off AS (
  SELECT bkt,
         coalesce(sum(bc) OVER (ORDER BY bkt
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS off_c
  FROM bt
),
ranked AS (
  SELECT v.value, v.cnt, v.n1v,
         off.off_c + coalesce(sum(v.cnt) OVER (
             PARTITION BY v.bkt ORDER BY v.value
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS prev_cum
  FROM vals v JOIN off ON v.bkt = off.bkt
),
m AS (
  SELECT sum(n1v)::BIGINT AS n1,
         sum(cnt - n1v)::BIGINT AS n0,
         {dsum_sql('n1v * (prev_cum + (cnt + 1) / 2.0)')} AS r1
  FROM ranked
)
SELECT n1 AS n_pos, n0 AS n_neg,
       (r1 - n1 * (n1 + 1) / 2.0) / (n1::DOUBLE * n0) AS auc,
       2.0 * ((r1 - n1 * (n1 + 1) / 2.0) / (n1::DOUBLE * n0)) - 1.0
         AS gini_coefficient
FROM m
""",
    doc="ROC AUC of `value` as a purchase-vs-click scorer via the "
    "rank/Mann-Whitney identity AUC = U/(n1*n0): tie-averaged ranks "
    "from two-level bucket-prefix sums, exact-decimal rank sum, one "
    "IEEE division — plus the Gini/accuracy-ratio. The binary-scorer "
    "eval over an event log at any scale (windows run on the "
    "distinct-value table, never the fact table).",
    tags=("aggregates", "stats", "extension"),
)
def a_roc_auc(spark, sf_dir):
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    s = ev.select(
        "value",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    vals = s.groupBy("value").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("y").alias("n1v")
    ).withColumn("bkt", F.floor("value").cast("long"))
    bt = vals.groupBy("bkt").agg(F.sum("cnt").alias("bc"))
    w_b = W.orderBy("bkt").rowsBetween(W.unboundedPreceding, -1)
    off = bt.select(
        "bkt", F.coalesce(F.sum("bc").over(w_b), F.lit(0)).alias("off_c")
    )
    w_l = (
        W.partitionBy("bkt").orderBy("value")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    ranked = vals.join(F.broadcast(off), "bkt").select(
        "value",
        "cnt",
        "n1v",
        (F.col("off_c") + F.coalesce(F.sum("cnt").over(w_l), F.lit(0))).alias(
            "prev_cum"
        ),
    )
    m = ranked.agg(
        F.sum("n1v").alias("n1"),
        F.sum(F.col("cnt") - F.col("n1v")).alias("n0"),
        dsum(F.col("n1v") * (F.col("prev_cum") + (F.col("cnt") + 1) / 2.0)).alias(
            "r1"
        ),
    )
    auc = (F.col("r1") - F.col("n1") * (F.col("n1") + 1) / 2.0) / (
        F.col("n1").cast("double") * F.col("n0")
    )
    return m.select(
        F.col("n1").alias("n_pos"),
        F.col("n0").alias("n_neg"),
        auc.alias("auc"),
        (2.0 * auc - 1.0).alias("gini_coefficient"),
    )


@register(
    "a_kruskal_wallis",
    # Kruskal-Wallis H (public 1952 statistic — the k-group extension
    # of Mann-Whitney, the nonparametric ANOVA twin): do the five
    # event types draw `value` from the same distribution? GLOBAL
    # tie-averaged ranks via the two-level bucket prefix (exact
    # rationals); per-group rank sums through the exact decimal path;
    # H = 12/(n(n+1)) * sum_g R_g^2/n_g - 3(n+1), divided by the tie
    # correction 1 - sum(t^3-t)/(n^3-n). R_g^2/n_g grows ~n^3/k, so
    # the 5-term sum is down-scaled 1e-6 through dsum (inverse of the
    # small-sum recipe; envelope |sum*1e-6| < 9e11 holds to ~sf3 —
    # past that, scale 1e-8). One fact-table aggregate to the
    # (value, type) grid; everything after is bounded by value
    # cardinality.
    oracle=f"""
WITH vals AS (
  SELECT value, count(*)::BIGINT AS cnt, floor(value)::BIGINT AS bkt
  FROM events GROUP BY 1
),
vt AS (
  SELECT value, event_type, count(*)::BIGINT AS cnt_vt
  FROM events GROUP BY 1, 2
),
bt AS (SELECT bkt, sum(cnt)::BIGINT AS bc FROM vals GROUP BY 1),
off AS (
  SELECT bkt,
         coalesce(sum(bc) OVER (ORDER BY bkt
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS off_c
  FROM bt
),
ranked AS (
  SELECT v.value, v.cnt,
         off.off_c + coalesce(sum(v.cnt) OVER (
             PARTITION BY v.bkt ORDER BY v.value
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + (v.cnt + 1) / 2.0 AS avg_rank
  FROM vals v JOIN off ON v.bkt = off.bkt
),
g AS (
  SELECT vt.event_type,
         sum(vt.cnt_vt)::BIGINT AS n_g,
         {dsum_sql('vt.cnt_vt * r.avg_rank')} AS r_g
  FROM vt JOIN ranked r ON vt.value = r.value
  GROUP BY vt.event_type
),
tie AS (
  SELECT sum(cnt)::BIGINT AS n,
         sum(cnt::HUGEINT * cnt * cnt - cnt)::DOUBLE AS tie_sum
  FROM vals
),
h AS (
  SELECT count(*)::BIGINT AS k,
         {dsum_sql('(r_g * r_g / n_g) * 1e-6')} / 1e-6 AS s
  FROM g
)
SELECT tie.n, h.k,
       12.0 / (tie.n * (tie.n + 1.0)) * h.s - 3.0 * (tie.n + 1) AS h_stat,
       1.0 - tie.tie_sum::DOUBLE
           / (tie.n::DOUBLE * tie.n * tie.n - tie.n) AS tie_factor,
       (12.0 / (tie.n * (tie.n + 1.0)) * h.s - 3.0 * (tie.n + 1))
         / (1.0 - tie.tie_sum::DOUBLE
                / (tie.n::DOUBLE * tie.n * tie.n - tie.n)) AS h_corrected
FROM tie, h
""",
    doc="Kruskal-Wallis H across the five event types (nonparametric "
    "one-way ANOVA on value): global tie-averaged ranks via two-level "
    "bucket prefix sums, exact-decimal per-group rank sums, "
    "tie-corrected H in one closed-form tree. Completes the rank-test "
    "family (Mann-Whitney for 2 groups, KW for k).",
    tags=("aggregates", "stats", "extension"),
)
def a_kruskal_wallis(spark, sf_dir):
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    vals = ev.groupBy("value").agg(F.count(F.lit(1)).alias("cnt")).withColumn(
        "bkt", F.floor("value").cast("long")
    )
    vt = ev.groupBy("value", "event_type").agg(F.count(F.lit(1)).alias("cnt_vt"))
    bt = vals.groupBy("bkt").agg(F.sum("cnt").alias("bc"))
    w_b = W.orderBy("bkt").rowsBetween(W.unboundedPreceding, -1)
    off = bt.select(
        "bkt", F.coalesce(F.sum("bc").over(w_b), F.lit(0)).alias("off_c")
    )
    w_l = (
        W.partitionBy("bkt").orderBy("value")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    ranked = vals.join(F.broadcast(off), "bkt").select(
        "value",
        "cnt",
        (
            F.col("off_c")
            + F.coalesce(F.sum("cnt").over(w_l), F.lit(0))
            + (F.col("cnt") + 1) / 2.0
        ).alias("avg_rank"),
    )
    g = (
        vt.join(ranked.select("value", "avg_rank"), "value")
        .groupBy("event_type")
        .agg(
            F.sum("cnt_vt").alias("n_g"),
            dsum(F.col("cnt_vt") * F.col("avg_rank")).alias("r_g"),
        )
    )
    tie = vals.agg(
        F.sum("cnt").alias("n"),
        # exact decimal cube / HUGEINT oracle twin: no int64 wrap at
        # cnt > ~2.09e6 (see a_mannwhitney_u tie_sum note)
        F.sum(
            F.col("cnt").cast("decimal(38,0)") * F.col("cnt") * F.col("cnt")
            - F.col("cnt")
        ).cast("double").alias("tie_sum"),
    )
    # R_g^2/n_g ~ n^3/k: down-scale 1e-6 through the exact-decimal sum
    # (envelope documented in the oracle comment)
    h = g.agg(
        F.count(F.lit(1)).alias("k"),
        (dsum((F.col("r_g") * F.col("r_g") / F.col("n_g")) * F.lit(1e-6)) / 1e-6)
        .alias("s"),
    )
    n = F.col("n")
    h_stat = 12.0 / (n * (n + F.lit(1.0))) * F.col("s") - 3.0 * (n + 1)
    tie_factor = F.lit(1.0) - F.col("tie_sum").cast("double") / (
        n.cast("double") * n * n - n
    )
    return tie.crossJoin(F.broadcast(h)).select(
        "n",
        "k",
        h_stat.alias("h_stat"),
        tie_factor.alias("tie_factor"),
        (h_stat / tie_factor).alias("h_corrected"),
    )


@register(
    "a_spearman_corr",
    # Spearman rank correlation with tie-averaged ranks (public:
    # Pearson over rank variables) between `value` and hour-of-day —
    # is value seasonal within the day? Both rank vectors are exact
    # .0/.5 rationals: value ranks from the two-level bucket prefix,
    # hour ranks from the 24-row hour-count table. The fact table
    # aggregates ONCE to the (value, hour) grid (bounded by value
    # cardinality x 24, not rows); every rank moment is a grid sum
    # weighted by cell count. Rank totals are n(n+1)/2 by identity —
    # only the three second moments are summed, each ~n^3, so they
    # carry the 1e-6 down-scale through the exact decimal path
    # (envelope to ~sf1-3, then re-scale; inverse of the small-sum
    # recipe). rho is one closed-form IEEE tree.
    oracle=f"""
WITH g AS (
  SELECT value, hour(ts)::BIGINT AS h, count(*)::BIGINT AS cnt
  FROM events GROUP BY 1, 2
),
vals AS (
  SELECT value, sum(cnt)::BIGINT AS cnt, floor(value)::BIGINT AS bkt
  FROM g GROUP BY 1
),
bt AS (SELECT bkt, sum(cnt)::BIGINT AS bc FROM vals GROUP BY 1),
off AS (
  SELECT bkt,
         coalesce(sum(bc) OVER (ORDER BY bkt
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS off_c
  FROM bt
),
rx AS (
  SELECT v.value,
         off.off_c + coalesce(sum(v.cnt) OVER (
             PARTITION BY v.bkt ORDER BY v.value
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + (v.cnt + 1) / 2.0 AS rxv
  FROM vals v JOIN off ON v.bkt = off.bkt
),
hours AS (SELECT h, sum(cnt)::BIGINT AS cnt FROM g GROUP BY 1),
ry AS (
  SELECT h,
         coalesce(sum(cnt) OVER (ORDER BY h
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + (cnt + 1) / 2.0 AS ryh
  FROM hours
),
m AS (
  SELECT sum(g.cnt)::BIGINT AS n,
         {dsum_sql('g.cnt * rx.rxv * ry.ryh * 1e-6')} / 1e-6 AS sxy,
         {dsum_sql('g.cnt * rx.rxv * rx.rxv * 1e-6')} / 1e-6 AS sxx,
         {dsum_sql('g.cnt * ry.ryh * ry.ryh * 1e-6')} / 1e-6 AS syy
  FROM g JOIN rx ON g.value = rx.value JOIN ry ON g.h = ry.h
)
SELECT n,
       (n * sxy - (n * (n + 1) / 2.0) * (n * (n + 1) / 2.0))
         / (sqrt(n * sxx - (n * (n + 1) / 2.0) * (n * (n + 1) / 2.0))
            * sqrt(n * syy - (n * (n + 1) / 2.0) * (n * (n + 1) / 2.0)))
         AS spearman_rho
FROM m
""",
    doc="Spearman rank correlation (tie-averaged) between value and "
    "hour-of-day: one fact-table aggregate to the (value, hour) grid, "
    "exact rational ranks (two-level prefix for value, 24-row table "
    "for hour), rank totals by the n(n+1)/2 identity, down-scaled "
    "exact-decimal second moments, closed-form rho. The monotone- "
    "dependence screen that needs no distributional assumption.",
    tags=("aggregates", "stats", "extension"),
)
def a_spearman_corr(spark, sf_dir):
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    g = ev.groupBy("value", F.hour("ts").cast("long").alias("h")).agg(
        F.count(F.lit(1)).alias("cnt")
    ).transform(lineage_cut_lazy)  # feeds vals, hours, and the moment join
    vals = g.groupBy("value").agg(F.sum("cnt").alias("cnt")).withColumn(
        "bkt", F.floor("value").cast("long")
    )
    bt = vals.groupBy("bkt").agg(F.sum("cnt").alias("bc"))
    w_b = W.orderBy("bkt").rowsBetween(W.unboundedPreceding, -1)
    off = bt.select(
        "bkt", F.coalesce(F.sum("bc").over(w_b), F.lit(0)).alias("off_c")
    )
    w_l = (
        W.partitionBy("bkt").orderBy("value")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    rx = vals.join(F.broadcast(off), "bkt").select(
        "value",
        (
            F.col("off_c")
            + F.coalesce(F.sum("cnt").over(w_l), F.lit(0))
            + (F.col("cnt") + 1) / 2.0
        ).alias("rxv"),
    )
    hours = g.groupBy("h").agg(F.sum("cnt").alias("cnt"))
    w_h = W.orderBy("h").rowsBetween(W.unboundedPreceding, -1)
    ry = hours.select(
        "h",
        (
            F.coalesce(F.sum("cnt").over(w_h), F.lit(0))
            + (F.col("cnt") + 1) / 2.0
        ).alias("ryh"),
    )
    m = (
        g.join(rx, "value")
        .join(F.broadcast(ry), "h")
        .agg(
            F.sum("cnt").alias("n"),
            (dsum(F.col("cnt") * F.col("rxv") * F.col("ryh") * F.lit(1e-6)) / 1e-6)
            .alias("sxy"),
            (dsum(F.col("cnt") * F.col("rxv") * F.col("rxv") * F.lit(1e-6)) / 1e-6)
            .alias("sxx"),
            (dsum(F.col("cnt") * F.col("ryh") * F.col("ryh") * F.lit(1e-6)) / 1e-6)
            .alias("syy"),
        )
    )
    n = F.col("n")
    st = n * (n + 1) / 2.0  # exact rank total (tie averages preserve it)
    return m.select(
        "n",
        (
            (n * F.col("sxy") - st * st)
            / (F.sqrt(n * F.col("sxx") - st * st) * F.sqrt(n * F.col("syy") - st * st))
        ).alias("spearman_rho"),
    )


@register(
    "a_brier_decomposition",
    # Brier score with the Murphy (1973) decomposition — the standard
    # audit of a probabilistic binary forecaster: BS = REL - RES + UNC
    # (reliability: calibration gap; resolution: how much the
    # forecasts separate outcomes; uncertainty: outcome base-rate
    # variance). Forecaster under test: Laplace-smoothed purchase
    # share per hour-of-day LEARNED ON THE FIRST HALF of the time
    # range, scored on the SECOND half (the PSI train/current split) —
    # a real temporal-generalization eval, not resubstitution. The
    # forecast takes 24 distinct values, so every term is a sum over
    # the 24-row (hour) grid of exact integer counts: BS expands as
    # [np*(1-f)^2 + (n-np)*f^2] per hour; ECE (the expected
    # calibration error every model card reports) rides along as
    # sum (n_h/N)|f_h - ybar_h|. Per-hour terms are O(1e-2): the
    # small-sum 1e6 scale carries them through the exact decimal path.
    # The additivity residual BS - (REL - RES + UNC) is part of the
    # gated row (near zero, bounded by IEEE rounding — the same
    # self-check discipline as a_theil_decomposition).
    oracle=f"""
WITH mid AS (
  SELECT (floor(epoch(min(ts)))::BIGINT + floor(epoch(max(ts)))::BIGINT) // 2
           AS mid_epoch
  FROM events
),
s AS (
  SELECT hour(ts)::BIGINT AS h,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
         CASE WHEN floor(epoch(ts))::BIGINT < mid.mid_epoch
              THEN 'train' ELSE 'test' END AS split
  FROM events, mid
),
hh AS (
  SELECT h,
         count(*) FILTER (WHERE split = 'train')::BIGINT AS ntr,
         sum(CASE WHEN split = 'train' THEN y ELSE 0 END)::BIGINT AS ptr,
         count(*) FILTER (WHERE split = 'test')::BIGINT AS nte,
         sum(CASE WHEN split = 'test' THEN y ELSE 0 END)::BIGINT AS pte
  FROM s GROUP BY h
),
f AS (
  -- nte > 0 guard: an hour empty in the test half would make ybarh a
  -- div-by-zero whose NULL propagates differently in Spark vs DuckDB;
  -- its brier term is identically 0, so dropping the hour changes no
  -- value (totals still come from the unfiltered hh)
  SELECT h, ntr, nte, pte,
         (ptr + 1.0) / (ntr + 2.0) AS fh,
         pte::DOUBLE / nte AS ybarh
  FROM hh WHERE nte > 0
),
tot AS (SELECT sum(nte)::BIGINT AS n_test, sum(ntr)::BIGINT AS n_train,
               sum(pte)::BIGINT AS p_test FROM hh),
terms AS (
  SELECT {dsum_sql('(pte * (1.0 - fh) * (1.0 - fh) + (nte - pte) * fh * fh) / tot.n_test * 1e6')} / 1e6 AS brier,
         {dsum_sql('nte * (fh - ybarh) * (fh - ybarh) / tot.n_test * 1e6')} / 1e6 AS rel,
         {dsum_sql('nte * (ybarh - tot.p_test::DOUBLE / tot.n_test) * (ybarh - tot.p_test::DOUBLE / tot.n_test) / tot.n_test * 1e6')} / 1e6 AS res,
         {dsum_sql('nte::DOUBLE / tot.n_test * abs(fh - ybarh) * 1e6')} / 1e6 AS ece
  FROM f, tot
)
SELECT tot.n_train, tot.n_test,
       terms.brier,
       terms.rel AS reliability,
       terms.res AS resolution,
       (tot.p_test::DOUBLE / tot.n_test)
         * (1.0 - tot.p_test::DOUBLE / tot.n_test) AS uncertainty,
       terms.brier - (terms.rel - terms.res
         + (tot.p_test::DOUBLE / tot.n_test)
           * (1.0 - tot.p_test::DOUBLE / tot.n_test)) AS additivity_residual,
       terms.ece
FROM tot, terms
""",
    doc="Brier score + Murphy decomposition (reliability - resolution "
    "+ uncertainty) and expected calibration error for an hour-of-day "
    "purchase forecaster trained on the first time-half and scored on "
    "the second: exact integer counts on a 24-row grid, Laplace- "
    "smoothed rational forecasts, 1e6-scaled exact-decimal term sums, "
    "additivity residual in the gated row. The probabilistic-eval "
    "counterpart of the threshold-free AUC.",
    tags=("aggregates", "stats", "extension"),
)
def a_brier_decomposition(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    mid = ev.agg(
        (
            (F.floor(F.unix_timestamp(F.min("ts"))).cast("long")
             + F.floor(F.unix_timestamp(F.max("ts"))).cast("long")) / 2
        ).cast("long").alias("mid_epoch")
    )
    s = ev.crossJoin(F.broadcast(mid)).select(
        F.hour("ts").cast("long").alias("h"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        F.when(
            F.unix_timestamp("ts").cast("long") < F.col("mid_epoch"), "train"
        ).otherwise("test").alias("split"),
    )
    hh = s.groupBy("h").agg(
        F.count(F.when(F.col("split") == "train", 1)).alias("ntr"),
        F.sum(F.when(F.col("split") == "train", F.col("y")).otherwise(0)).alias(
            "ptr"
        ),
        F.count(F.when(F.col("split") == "test", 1)).alias("nte"),
        F.sum(F.when(F.col("split") == "test", F.col("y")).otherwise(0)).alias(
            "pte"
        ),
    ).transform(lineage_cut_lazy)  # tot + terms both read the 24-row grid
    # nte > 0 guard (oracle comment): empty-test hours contribute 0 to
    # every term but NULL-poison ybarh — drop them here, total from hh
    f = hh.filter(F.col("nte") > 0).select(
        "h",
        "ntr",
        "nte",
        "pte",
        ((F.col("ptr") + 1.0) / (F.col("ntr") + 2.0)).alias("fh"),
        (F.col("pte").cast("double") / F.col("nte")).alias("ybarh"),
    )
    tot = hh.agg(
        F.sum("nte").alias("n_test"),
        F.sum("ntr").alias("n_train"),
        F.sum("pte").alias("p_test"),
    )
    ybar = F.col("p_test").cast("double") / F.col("n_test")
    fh, yb, nte, pte = F.col("fh"), F.col("ybarh"), F.col("nte"), F.col("pte")
    nt = F.col("n_test")
    terms = f.crossJoin(F.broadcast(tot)).agg(
        (dsum(
            (pte * (1.0 - fh) * (1.0 - fh) + (nte - pte) * fh * fh)
            / nt * F.lit(1e6)
        ) / 1e6).alias("brier"),
        (dsum(nte * (fh - yb) * (fh - yb) / nt * F.lit(1e6)) / 1e6).alias("rel"),
        (dsum(nte * (yb - ybar) * (yb - ybar) / nt * F.lit(1e6)) / 1e6).alias(
            "res"
        ),
        (dsum(nte.cast("double") / nt * F.abs(fh - yb) * F.lit(1e6)) / 1e6).alias(
            "ece"
        ),
    )
    unc = ybar * (1.0 - ybar)
    return tot.crossJoin(F.broadcast(terms)).select(
        "n_train",
        "n_test",
        "brier",
        F.col("rel").alias("reliability"),
        F.col("res").alias("resolution"),
        unc.alias("uncertainty"),
        (F.col("brier") - (F.col("rel") - F.col("res") + unc)).alias(
            "additivity_residual"
        ),
        "ece",
    )


@register(
    "a_kendall_tau",
    # Kendall tau-b (public 1945 statistic; the tie-corrected
    # concordance coefficient) between `value` and hour-of-day — the
    # pair-counting twin of a_spearman_corr. The naive method is
    # O(n^2) pairs; the distributed method here exploits that one
    # variable (hour) has a tiny domain: aggregate the fact table ONCE
    # to the dense (distinct value x 24 hour) grid (bounded by the
    # value DOMAIN at any corpus size), then count concordant/
    # discordant pairs with two cascaded prefix sums —
    # cumv(v,h) = #rows with value' < v in hour h (window per hour
    # over the value-sorted grid), then A(v,h) = sum_{h'<h} cumv(v,h')
    # and B(v,h) = sum_{h'>h} cumv(v,h') (window per value over the
    # 24 hours). C = sum cnt*A, D = sum cnt*B count each pair exactly
    # once. Tie terms n1 (value ties) and n2 (hour ties) are exact
    # BIGINTs; tau_b = (C - D)/sqrt((n0-n1)*(n0-n2)) is one IEEE tree.
    # C/D summands reach ~n^2 per cell (sum ~n^3/const), so they ride
    # the 1e-6 down-scaled exact-decimal sum (same envelope note as
    # a_kruskal_wallis).
    oracle=f"""
WITH g0 AS (
  SELECT value, hour(ts)::BIGINT AS h, count(*)::BIGINT AS cnt
  FROM events GROUP BY 1, 2
),
vals AS (SELECT DISTINCT value FROM g0),
hrs AS (SELECT DISTINCT h FROM g0),
g AS (
  SELECT vals.value, hrs.h, coalesce(g0.cnt, 0)::BIGINT AS cnt
  FROM vals CROSS JOIN hrs
  LEFT JOIN g0 ON g0.value = vals.value AND g0.h = hrs.h
),
cv AS (
  SELECT value, h, cnt,
         coalesce(sum(cnt) OVER (PARTITION BY h ORDER BY value
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cumv
  FROM g
),
ab AS (
  SELECT value, h, cnt,
         coalesce(sum(cumv) OVER (PARTITION BY value ORDER BY h
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS a,
         sum(cumv) OVER (PARTITION BY value)
           - coalesce(sum(cumv) OVER (PARTITION BY value ORDER BY h
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           - cumv AS b
  FROM cv
),
cd AS (
  SELECT {dsum_sql('cnt * a * 1e-6')} / 1e-6 AS c,
         {dsum_sql('cnt * b * 1e-6')} / 1e-6 AS d
  FROM ab
),
ties AS (
  SELECT (SELECT sum(cnt)::BIGINT FROM g0) AS n,
         (SELECT sum(ct * (ct - 1) / 2)::BIGINT FROM
            (SELECT sum(cnt)::BIGINT AS ct FROM g0 GROUP BY value)) AS n1,
         (SELECT sum(ct * (ct - 1) / 2)::BIGINT FROM
            (SELECT sum(cnt)::BIGINT AS ct FROM g0 GROUP BY h)) AS n2
)
SELECT ties.n, cd.c AS concordant, cd.d AS discordant,
       (cd.c - cd.d)
         / sqrt((ties.n * (ties.n - 1) / 2.0 - ties.n1)
                * (ties.n * (ties.n - 1) / 2.0 - ties.n2)) AS kendall_tau_b
FROM ties, cd
""",
    doc="Kendall tau-b between value and hour-of-day without the "
    "O(n^2) pair scan: dense (value x 24) grid, cascaded prefix sums "
    "count concordant/discordant pairs exactly once, BIGINT tie "
    "terms, closed-form tau-b. Bounded by the value domain x 24 at "
    "any corpus size — the pair-counting twin of a_spearman_corr.",
    tags=("aggregates", "stats", "extension"),
)
def a_kendall_tau(spark, sf_dir):
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    g0 = ev.groupBy("value", F.hour("ts").cast("long").alias("h")).agg(
        F.count(F.lit(1)).alias("cnt")
    ).transform(lineage_cut_lazy)  # grid + both tie censuses
    vals = g0.select("value").distinct()
    hrs = g0.select("h").distinct()
    g = (
        vals.crossJoin(F.broadcast(hrs))
        .join(g0, ["value", "h"], "left")
        .select("value", "h", F.coalesce("cnt", F.lit(0)).alias("cnt"))
    )
    w_v = (
        W.partitionBy("h").orderBy("value")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    cv = g.select(
        "value",
        "h",
        "cnt",
        F.coalesce(F.sum("cnt").over(w_v), F.lit(0)).alias("cumv"),
    )
    w_h = (
        W.partitionBy("value").orderBy("h")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    w_all = W.partitionBy("value")
    a = F.coalesce(F.sum("cumv").over(w_h), F.lit(0))
    ab = cv.select(
        "cnt",
        a.alias("a"),
        (F.sum("cumv").over(w_all) - a - F.col("cumv")).alias("b"),
    )
    cd = ab.agg(
        (dsum(F.col("cnt") * F.col("a") * F.lit(1e-6)) / 1e-6).alias("c"),
        (dsum(F.col("cnt") * F.col("b") * F.lit(1e-6)) / 1e-6).alias("d"),
    )
    vt = g0.groupBy("value").agg(F.sum("cnt").alias("ct")).agg(
        F.sum(F.col("ct") * (F.col("ct") - 1) / 2).cast("long").alias("n1")
    )
    ht = g0.groupBy("h").agg(F.sum("cnt").alias("ct")).agg(
        F.sum(F.col("ct") * (F.col("ct") - 1) / 2).cast("long").alias("n2")
    )
    tot = g0.agg(F.sum("cnt").alias("n"))
    n = F.col("n")
    n0 = n * (n - 1) / 2.0
    return (
        tot.crossJoin(F.broadcast(vt))
        .crossJoin(F.broadcast(ht))
        .crossJoin(F.broadcast(cd))
        .select(
            "n",
            F.col("c").alias("concordant"),
            F.col("d").alias("discordant"),
            (
                (F.col("c") - F.col("d"))
                / F.sqrt((n0 - F.col("n1")) * (n0 - F.col("n2")))
            ).alias("kendall_tau_b"),
        )
    )


@register(
    "a_mcnemar_test",
    # McNemar's test (public 1947 statistic — the PAIRED complement of
    # Cohen's kappa on the same two document-quality raters): kappa
    # asks "do the raters agree beyond chance?", McNemar asks "do they
    # DISAGREE symmetrically?" — a systematic bias shows as b != c in
    # the off-diagonal of the paired 2x2 (rater A high / rater B high).
    # chi2 = (b-c)^2/(b+c) plus the Edwards continuity-corrected
    # (|b-c|-1)^2/(b+c); both are single IEEE divisions over exact
    # integer counts — bit-identical everywhere. Same two hash
    # aggregates as kappa (word counts, then the 1-row paired table).
    oracle=f"""
WITH d AS (
  SELECT doc_id, text, string_split(lower(text), ' ') AS wlist
  FROM documents
),
qa AS (
  SELECT doc_id,
         CASE WHEN ({quality_score_sql('wlist', 'text')}) > {KAPPA_Q_MID}
              THEN 1 ELSE 0 END AS a_yes
  FROM d
),
tw AS (
  SELECT doc_id, max(c)::DOUBLE / any_value(n) AS top_share
  FROM (SELECT doc_id, word, count(*)::BIGINT AS c, any_value(n) AS n
        FROM (SELECT doc_id, unnest(wlist) AS word, len(wlist) AS n FROM d)
        GROUP BY doc_id, word)
  GROUP BY doc_id
),
qb AS (
  SELECT doc_id,
         CASE WHEN top_share <= {KAPPA_R_MID} THEN 1 ELSE 0 END AS b_yes
  FROM tw
),
m AS (
  SELECT count(*)::BIGINT AS n,
         sum(CASE WHEN a_yes = 1 AND b_yes = 1 THEN 1 ELSE 0 END)::BIGINT AS both_yes,
         sum(CASE WHEN a_yes = 0 AND b_yes = 0 THEN 1 ELSE 0 END)::BIGINT AS both_no,
         sum(CASE WHEN a_yes = 1 AND b_yes = 0 THEN 1 ELSE 0 END)::BIGINT AS b_cell,
         sum(CASE WHEN a_yes = 0 AND b_yes = 1 THEN 1 ELSE 0 END)::BIGINT AS c_cell
  FROM qa JOIN qb USING (doc_id)
)
SELECT n, both_yes, both_no, b_cell, c_cell,
       (b_cell - c_cell) * (b_cell - c_cell)
         / (b_cell + c_cell)::DOUBLE AS chi2,
       (abs(b_cell - c_cell) - 1) * (abs(b_cell - c_cell) - 1)
         / (b_cell + c_cell)::DOUBLE AS chi2_corrected
FROM m
""",
    doc="McNemar's paired test on the kappa raters binarized at their "
    "'high' cuts: off-diagonal disagreement cells b/c from exact "
    "integer counts, plain and continuity-corrected chi2 — detects "
    "systematic rater bias that symmetric agreement measures miss.",
    tags=("aggregates", "stats", "extension"),
)
def a_mcnemar_test(spark, sf_dir):
    from ..operators.text import quality_score

    docs = load(spark, sf_dir, "documents").withColumn(
        "w", F.split(F.lower("text"), " ")
    )
    q = quality_score("w", F.col("text"))
    qa = docs.select(
        "doc_id", F.when(q > KAPPA_Q_MID, 1).otherwise(0).alias("a_yes")
    )
    words = docs.select(
        "doc_id", F.size("w").cast("long").alias("n"), F.explode("w").alias("word")
    )
    wc = words.groupBy("doc_id", "word").agg(
        F.count(F.lit(1)).alias("c"), F.first("n").alias("n")
    )
    tw = wc.groupBy("doc_id").agg(
        (F.max("c").cast("double") / F.first("n")).alias("top_share")
    )
    qb = tw.select(
        "doc_id",
        F.when(F.col("top_share") <= KAPPA_R_MID, 1).otherwise(0).alias("b_yes"),
    )
    m = qa.join(qb, "doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when((F.col("a_yes") == 1) & (F.col("b_yes") == 1), 1).otherwise(0)
        ).alias("both_yes"),
        F.sum(
            F.when((F.col("a_yes") == 0) & (F.col("b_yes") == 0), 1).otherwise(0)
        ).alias("both_no"),
        F.sum(
            F.when((F.col("a_yes") == 1) & (F.col("b_yes") == 0), 1).otherwise(0)
        ).alias("b_cell"),
        F.sum(
            F.when((F.col("a_yes") == 0) & (F.col("b_yes") == 1), 1).otherwise(0)
        ).alias("c_cell"),
    )
    b, c = F.col("b_cell"), F.col("c_cell")
    return m.select(
        "n",
        "both_yes",
        "both_no",
        "b_cell",
        "c_cell",
        ((b - c) * (b - c) / (b + c).cast("double")).alias("chi2"),
        (
            (F.abs(b - c) - 1) * (F.abs(b - c) - 1) / (b + c).cast("double")
        ).alias("chi2_corrected"),
    )


PERM_R = 40  # deterministic label reassignments for the null


@register(
    "a_permutation_test",
    # Permutation test of the weekend-vs-weekday mean value gap —
    # assumption-free significance for the same split the Welch t and
    # Mann-Whitney queries test parametrically/by ranks. The textbook
    # method shuffles labels with a RNG; at 100 TB (and under Spark
    # task retries) rand() breaks determinism, so the null draws come
    # from R={PERM_R} md5-SALTED sticky reassignments: resample r
    # flips each event's label by the byte coin md5('perm<r>|' ||
    # event_id) — independent across salts, reproducible on any
    # cluster, and replayed bit-identically by the oracle. The coin
    # THRESHOLD matches the OBSERVED weekend marginal w = n_we/n
    # (thr = round(256*w) via exact integer floor-division
    # (512*n_we + n) div (2n), identical in both engines): a balanced
    # P=1/2 coin would draw null splits with w(1-w)=0.25 instead of
    # the design's ~0.204, making null |d_r| stochastically smaller
    # than d_obs's H0 distribution and the p-value anti-conservative
    # (r11 ADVICE). Each resample's mean gap uses exact-decimal sums;
    # p = (1 + #{|d_r| >= |d_obs|}) / (R + 1) (the add-one form,
    # Phipson & Smyth 2010). Plan: one explode to R x n rows, ONE
    # map-side-combined hash aggregate by r (R groups), broadcast
    # 1-row threshold + d_obs joins — no shuffle grows with R beyond
    # the R-row group table.
    oracle=f"""
WITH s AS (
  SELECT event_id, value,
         CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS we
  FROM events
),
obs AS (
  SELECT {dsum_sql('CASE WHEN we = 1 THEN value END')}
           / count(*) FILTER (WHERE we = 1) -
         {dsum_sql('CASE WHEN we = 0 THEN value END')}
           / count(*) FILTER (WHERE we = 0) AS d_obs,
         count(*)::BIGINT AS n,
         count(*) FILTER (WHERE we = 1)::BIGINT AS n_we
  FROM s
),
thr AS (SELECT (512 * n_we + n) // (2 * n) AS thr FROM obs),
perm AS (
  SELECT r.r, s.value,
         CASE WHEN ('0x' || substr(md5('perm' || r.r::VARCHAR || '|' || s.event_id::VARCHAR), 1, 2))::INT < thr.thr
              THEN 1 ELSE 0 END AS pwe
  FROM s, (SELECT unnest(range({PERM_R})) AS r) r, thr
),
draws AS (
  SELECT r,
         {dsum_sql('CASE WHEN pwe = 1 THEN value END')}
           / count(*) FILTER (WHERE pwe = 1) -
         {dsum_sql('CASE WHEN pwe = 0 THEN value END')}
           / count(*) FILTER (WHERE pwe = 0) AS d_r
  FROM perm GROUP BY r
),
tail AS (
  SELECT count(*)::BIGINT AS n_extreme
  FROM draws, obs WHERE abs(d_r) >= abs(d_obs)
)
SELECT obs.n, obs.d_obs, {PERM_R}::BIGINT AS r_used, tail.n_extreme,
       (1.0 + tail.n_extreme) / ({PERM_R} + 1.0) AS p_value
FROM obs, tail
""",
    doc="Permutation test of the weekend/weekday mean-value gap with "
    "deterministic md5-salted label reassignments instead of a RNG "
    "(reproducible under task retries, replayed bit-identically by "
    "the oracle), coin threshold matched to the observed weekend "
    "marginal so the null preserves the ~2/7 split-size distribution: "
    "R=40 resamples in one exploded map-side aggregate, add-one "
    "p-value — the assumption-free member of the weekend-split test "
    "family (Welch t, Mann-Whitney U).",
    tags=("aggregates", "stats", "extension"),
)
def a_permutation_test(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    we = F.when(F.dayofweek("ts").isin(1, 7), 1).otherwise(0)
    s = ev.select("event_id", "value", we.alias("we"))

    def gap(flag):
        return (
            dsum(F.when(F.col(flag) == 1, F.col("value")))
            / F.count(F.when(F.col(flag) == 1, 1))
            - dsum(F.when(F.col(flag) == 0, F.col("value")))
            / F.count(F.when(F.col(flag) == 0, 1))
        )

    obs = s.agg(
        gap("we").alias("d_obs"),
        F.count(F.lit(1)).alias("n"),
        F.sum("we").alias("n_we"),
    )
    # marginal-matched coin threshold round(256 * n_we/n) as exact
    # integer floor-division — identical arithmetic in both engines
    thr = obs.select(F.expr("(512 * n_we + n) div (2 * n)").alias("thr"))
    coin = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("perm"),
                    F.col("r").cast("string"),
                    F.lit("|"),
                    F.col("event_id").cast("string"),
                )
            ),
            1,
            2,
        ),
        16,
        10,
    ).cast("int")
    perm = (
        s.crossJoin(F.broadcast(thr))
        .select(
            "event_id",
            "value",
            "thr",
            F.explode(F.sequence(F.lit(0), F.lit(PERM_R - 1))).alias("r"),
        )
        .select(
            "value", "r",
            F.when(coin < F.col("thr"), 1).otherwise(0).alias("pwe"),
        )
    )
    draws = perm.groupBy("r").agg(gap("pwe").alias("d_r"))
    tail = (
        draws.crossJoin(F.broadcast(obs.select("d_obs")))
        .filter(F.abs(F.col("d_r")) >= F.abs(F.col("d_obs")))
        .agg(F.count(F.lit(1)).alias("n_extreme"))
    )
    return obs.crossJoin(F.broadcast(tail)).select(
        "n",
        "d_obs",
        F.lit(PERM_R).cast("long").alias("r_used"),
        "n_extreme",
        ((1.0 + F.col("n_extreme")) / (PERM_R + 1.0)).alias("p_value"),
    )


FLEISS_E_LOW, FLEISS_E_MID = 4.076745, 4.122895  # char-entropy band cuts
# (placed at midpoints of measured inter-doc entropy gaps in the UNION
# of the sf0.001/sf0.01/sf0.1 corpora: every doc sits >= 1.6e-4 (LOW) /
# 8.8e-5 (MID) away — above the recipe's dominant wobble, the dsum 4-dp
# final round (5e-5) plus the %.7f ln term quantization (5e-8) — so
# banding agrees between the engine's quantized bits AND an unquantized
# numpy recompute at every gated SF. r12 re-placement: the r11 cuts
# held 2.5e-4 only at sf0.001 and collapsed to 5.8e-6 at sf0.1.
# EXECUTABLE: tests/test_band_margins.py recomputes the margins from
# raw parquet each run; a TESTDATA regen that collapses one fails.


@register(
    "a_fleiss_kappa",
    # Fleiss' kappa (public 1971 statistic — inter-rater agreement for
    # m raters, the generalization Cohen's 2-rater kappa can't do; the
    # reference's own domain is annotation verification, where >2
    # annotators per item is the norm): THREE document-quality raters
    # band every doc low/mid/high — A the Gopher/C4 composite score, B
    # top-word dominance (both from a_cohens_kappa), C character
    # entropy (char_entropy_frame's engine-exact bits). With n_ij =
    # raters assigning category j to doc i, everything reduces to
    # INTEGERS: S = sum n_ij^2 gives P-bar = (S - 3N)/(6N), category
    # column totals c_j give P_e = sum c_j^2/(9N^2), kappa =
    # (P-bar - P_e)/(1 - P_e) — three IEEE divisions at the very end,
    # no decimal sums at all. Honest reading: the raters measure
    # different text properties, so kappa sits near 0, same as the
    # pairwise Cohen's result. Plan: three doc-grain band passes
    # union-ed, one (doc, cat) count, two 1-row combines.
    oracle=f"""
WITH d AS (
  SELECT doc_id, text, string_split(lower(text), ' ') AS wlist
  FROM documents
),
qa AS (
  SELECT doc_id,
         CASE WHEN ({quality_score_sql('wlist', 'text')}) <= {KAPPA_Q_LOW} THEN 'low'
              WHEN ({quality_score_sql('wlist', 'text')}) <= {KAPPA_Q_MID} THEN 'mid'
              ELSE 'high' END AS cat
  FROM d
),
tw AS (
  SELECT doc_id, max(c)::DOUBLE / any_value(n) AS top_share
  FROM (SELECT doc_id, word, count(*)::BIGINT AS c, any_value(n) AS n
        FROM (SELECT doc_id, unnest(wlist) AS word, len(wlist) AS n FROM d)
        GROUP BY doc_id, word)
  GROUP BY doc_id
),
qb AS (
  SELECT doc_id,
         CASE WHEN top_share > {KAPPA_R_LOW} THEN 'low'
              WHEN top_share > {KAPPA_R_MID} THEN 'mid'
              ELSE 'high' END AS cat
  FROM tw
),
{CHAR_ENTROPY_CTES},
qc AS (
  SELECT doc_id,
         CASE WHEN entropy_bits <= {FLEISS_E_LOW} THEN 'low'
              WHEN entropy_bits <= {FLEISS_E_MID} THEN 'mid'
              ELSE 'high' END AS cat
  FROM ent
),
r AS (
  SELECT doc_id, cat FROM qa
  UNION ALL SELECT doc_id, cat FROM qb
  UNION ALL SELECT doc_id, cat FROM qc
),
nij AS (SELECT doc_id, cat, count(*)::BIGINT AS nij FROM r GROUP BY 1, 2),
s AS (
  SELECT count(DISTINCT doc_id)::BIGINT AS n,
         sum(nij * nij)::BIGINT AS s_sq
  FROM nij
),
cj AS (SELECT sum(nij * nij_tot)::BIGINT AS c2 FROM (
         SELECT 1 AS one, sum(nij)::BIGINT AS nij, sum(nij)::BIGINT AS nij_tot
         FROM nij GROUP BY cat))
SELECT s.n,
       (s.s_sq - 3 * s.n)::DOUBLE / (6 * s.n) AS p_bar,
       cj.c2::DOUBLE / (9 * s.n * s.n) AS p_e,
       ((s.s_sq - 3 * s.n)::DOUBLE / (6 * s.n)
          - cj.c2::DOUBLE / (9 * s.n * s.n))
         / (1.0 - cj.c2::DOUBLE / (9 * s.n * s.n)) AS fleiss_kappa
FROM s, cj
""",
    doc="Fleiss' kappa over THREE document-quality raters (composite "
    "score, top-word dominance, character entropy; 3 bands each): "
    "m-rater chance-corrected agreement from pure integer aggregates "
    "— S = sum n_ij^2 and category totals — with three IEEE divisions "
    "at the boundary. Generalizes the pairwise Cohen's kappa audit to "
    "the multi-annotator pipelines the reference's domain actually "
    "runs; near-zero here is the honest reading (the raters measure "
    "different properties).",
    tags=("aggregates", "stats", "extension"),
)
def a_fleiss_kappa(spark, sf_dir):
    from ..operators.text import char_entropy_frame, quality_score

    docs = load(spark, sf_dir, "documents").withColumn(
        "w", F.split(F.lower("text"), " ")
    )
    q = quality_score("w", F.col("text"))
    qa = docs.select(
        "doc_id",
        F.when(q <= KAPPA_Q_LOW, "low")
        .when(q <= KAPPA_Q_MID, "mid")
        .otherwise("high")
        .alias("cat"),
    )
    words = docs.select(
        "doc_id", F.size("w").cast("long").alias("n"), F.explode("w").alias("word")
    )
    wc = words.groupBy("doc_id", "word").agg(
        F.count(F.lit(1)).alias("c"), F.first("n").alias("n")
    )
    tw = wc.groupBy("doc_id").agg(
        (F.max("c").cast("double") / F.first("n")).alias("top_share")
    )
    qb = tw.select(
        "doc_id",
        F.when(F.col("top_share") > KAPPA_R_LOW, "low")
        .when(F.col("top_share") > KAPPA_R_MID, "mid")
        .otherwise("high")
        .alias("cat"),
    )
    qc = char_entropy_frame(docs).select(
        "doc_id",
        F.when(F.col("entropy_bits") <= FLEISS_E_LOW, "low")
        .when(F.col("entropy_bits") <= FLEISS_E_MID, "mid")
        .otherwise("high")
        .alias("cat"),
    )
    r = qa.unionByName(qb).unionByName(qc)
    nij = r.groupBy("doc_id", "cat").agg(F.count(F.lit(1)).alias("nij"))
    s = nij.agg(
        F.countDistinct("doc_id").alias("n"),
        F.sum(F.col("nij") * F.col("nij")).alias("s_sq"),
    )
    cj = (
        nij.groupBy("cat")
        .agg(F.sum("nij").alias("cjt"))
        .agg(F.sum(F.col("cjt") * F.col("cjt")).alias("c2"))
    )
    n, s_sq, c2 = F.col("n"), F.col("s_sq"), F.col("c2")
    p_bar = (s_sq - 3 * n).cast("double") / (6 * n)
    p_e = c2.cast("double") / (9 * n * n)
    return s.crossJoin(F.broadcast(cj)).select(
        "n",
        p_bar.alias("p_bar"),
        p_e.alias("p_e"),
        ((p_bar - p_e) / (1.0 - p_e)).alias("fleiss_kappa"),
    )


@register(
    "a_levene_test",
    # Levene's test, Brown-Forsythe variant (public: Brown & Forsythe
    # 1974 — the robust homogeneity-of-variance check that guards the
    # one-way ANOVA's equal-variance assumption; the median-centered
    # form is the recommendation in every stats handbook): per event
    # type compute z = |value - median_g| with the EXACT rank-selected
    # group median (lower-element convention, unique (value, event_id)
    # chain — the a_winsorized_mean machinery, per group), then run
    # the one-way ANOVA F on z (the a_anova_oneway recipe: exact-
    # decimal moments, %.7f-quantized S_g^2/n_g terms). W > F_crit
    # means variances differ and the plain ANOVA's F is suspect —
    # reported next to each other, this is the assumption audit.
    # Plan: the median selection touches only per-group bucket counts
    # + the two selected buckets; z is a broadcast-join expression;
    # one map-side-combined pass builds the moments.
    oracle=f"""
WITH ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
med AS (
  SELECT event_type,
         min(CASE WHEN rn = ((n - 1) * 50) // 100 + 1 THEN value END) AS med
  FROM ranked GROUP BY event_type
),
z AS (
  SELECT e.event_type, abs(e.value - med.med) AS z
  FROM events e JOIN med ON e.event_type = med.event_type
),
g AS (
  SELECT event_type,
         count(*)::BIGINT AS n_g,
         {dsum_sql('z')} AS s_g,
         {dsum_sql('(z * z)')} AS ss_g
  FROM z GROUP BY event_type
),
terms AS (
  SELECT event_type, n_g, s_g, ss_g,
         printf('%.7f', s_g * s_g / n_g)::DOUBLE AS t_g
  FROM g
),
tot AS (
  SELECT sum(n_g)::BIGINT AS n,
         round(sum((s_g)::DECIMAL(30,10)), 4)::DOUBLE AS s,
         round(sum((ss_g)::DECIMAL(30,10)), 4)::DOUBLE AS ss,
         round(sum((t_g)::DECIMAL(30,10)), 4)::DOUBLE AS sum_t,
         count(*)::BIGINT AS k
  FROM terms
)
SELECT k, n,
       ((sum_t - s * s / n) / (k - 1))
         / ((ss - sum_t) / (n - k)) AS w_stat,
       sum_t - s * s / n AS ss_between,
       ss - sum_t AS ss_within
FROM tot
""",
    doc="Brown-Forsythe / Levene homogeneity-of-variance test across "
    "event types: exact rank-selected group medians, z = |x - med_g| "
    "as a broadcast-join expression, then the one-way ANOVA F on z "
    "from decimal-exact moments — the assumption audit that decides "
    "whether a_anova_oneway's equal-variance F (vs a_welch_ttest's "
    "unequal-variance path) is trustworthy.",
    tags=("aggregates", "stats", "extension"),
)
def a_levene_test(spark, sf_dir):
    from ..functions.exact import DEC, RSCALE
    from ..operators.quantiles import exact_group_quantiles

    ev = load(spark, sf_dir, "events")
    med = exact_group_quantiles(
        ev,
        "event_type",
        "value",
        "event_id",
        [("med", 50, 100)],
        F.floor(F.col("value") / 50).cast("long"),
    ).select("event_type", F.col("med").alias("med"))
    z = ev.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("med")).alias("z")
    )
    g = z.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_g"),
        dsum("z").alias("s_g"),
        dsum(F.col("z") * F.col("z")).alias("ss_g"),
    )
    terms = g.withColumn(
        "t_g",
        F.format_string(
            "%.7f", F.col("s_g") * F.col("s_g") / F.col("n_g")
        ).cast("double"),
    )

    def dsum_simple(c):
        return F.round(F.sum(F.col(c).cast(DEC)), RSCALE).cast("double")

    tot = terms.agg(
        F.sum("n_g").cast("long").alias("n"),
        dsum_simple("s_g").alias("s"),
        dsum_simple("ss_g").alias("ss"),
        dsum_simple("t_g").alias("sum_t"),
        F.count(F.lit(1)).alias("k"),
    )
    ssb = F.col("sum_t") - F.col("s") * F.col("s") / F.col("n")
    ssw = F.col("ss") - F.col("sum_t")
    return tot.select(
        "k",
        "n",
        ((ssb / (F.col("k") - 1)) / (ssw / (F.col("n") - F.col("k")))).alias(
            "w_stat"
        ),
        ssb.alias("ss_between"),
        ssw.alias("ss_within"),
    )


@register(
    "a_tukey_hsd",
    # Tukey's HSD post-hoc (public 1949 method — the pairwise
    # follow-up every ANOVA needs: the omnibus F says "some means
    # differ", HSD says WHICH pairs): for every pair of event types,
    # the studentized-range statistic q = |m_i - m_j| /
    # sqrt(MSW/2 * (1/n_i + 1/n_j)) (the Tukey-Kramer unequal-n
    # form), with MSW the within-group mean square from the SAME
    # decimal-exact moments as a_anova_oneway. Critical values of the
    # studentized range distribution need tables, so the gated output
    # reports the q statistics and mean differences (the ranking and
    # effect sizes), not p-values — completing the workflow
    # a_anova_oneway (omnibus) -> a_levene_test (assumption) ->
    # a_tukey_hsd (which pairs). Plan: one map-side-combined pass to
    # the 5-row group table, a broadcast k x k self-join (k*(k-1)/2 =
    # 10 pairs), pure closed-form doubles.
    oracle=f"""
WITH g AS (
  SELECT event_type,
         count(*)::BIGINT AS n_g,
         {dsum_sql('value')} AS s_g,
         {dsum_sql('(value * value)')} AS ss_g
  FROM events GROUP BY event_type
),
terms AS (
  SELECT event_type, n_g, s_g, ss_g,
         printf('%.7f', s_g * s_g / n_g)::DOUBLE AS t_g
  FROM g
),
tot AS (
  SELECT sum(n_g)::BIGINT AS n,
         round(sum((ss_g)::DECIMAL(30,10)), 4)::DOUBLE AS ss,
         round(sum((t_g)::DECIMAL(30,10)), 4)::DOUBLE AS sum_t,
         count(*)::BIGINT AS k
  FROM terms
),
msw AS (SELECT (ss - sum_t) / (n - k) AS msw, n, k FROM tot),
pairs AS (
  SELECT a.event_type AS group_a, b.event_type AS group_b,
         a.n_g AS n_a, b.n_g AS n_b,
         a.s_g / a.n_g - b.s_g / b.n_g AS mean_diff
  FROM g a JOIN g b ON a.event_type < b.event_type
)
SELECT p.group_a, p.group_b, p.n_a, p.n_b, p.mean_diff,
       abs(p.mean_diff)
         / sqrt(msw.msw / 2.0 * (1.0 / p.n_a + 1.0 / p.n_b)) AS q_stat
FROM pairs p, msw
ORDER BY p.group_a, p.group_b
""",
    doc="Tukey-Kramer HSD post-hoc: studentized-range q for every "
    "event-type pair from the ANOVA's decimal-exact moments (MSW "
    "shared with a_anova_oneway) — completes the workflow omnibus F "
    "-> Levene assumption audit -> which-pairs post-hoc. Reports q "
    "and mean differences; critical values are table lookups outside "
    "the engine.",
    tags=("aggregates", "stats", "extension"),
)
def a_tukey_hsd(spark, sf_dir):
    from ..functions.exact import DEC, RSCALE

    ev = load(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_g"),
        dsum("value").alias("s_g"),
        dsum(F.col("value") * F.col("value")).alias("ss_g"),
    ).transform(lineage_cut_lazy)  # msw + both self-join sides
    terms = g.withColumn(
        "t_g",
        F.format_string(
            "%.7f", F.col("s_g") * F.col("s_g") / F.col("n_g")
        ).cast("double"),
    )

    def dsum_simple(c):
        return F.round(F.sum(F.col(c).cast(DEC)), RSCALE).cast("double")

    tot = terms.agg(
        F.sum("n_g").cast("long").alias("n"),
        dsum_simple("ss_g").alias("ss"),
        dsum_simple("t_g").alias("sum_t"),
        F.count(F.lit(1)).alias("k"),
    )
    msw = tot.select(
        ((F.col("ss") - F.col("sum_t")) / (F.col("n") - F.col("k"))).alias(
            "msw"
        )
    )
    a = g.select(
        F.col("event_type").alias("group_a"),
        F.col("n_g").alias("n_a"),
        (F.col("s_g") / F.col("n_g")).alias("m_a"),
    )
    b = g.select(
        F.col("event_type").alias("group_b"),
        F.col("n_g").alias("n_b"),
        (F.col("s_g") / F.col("n_g")).alias("m_b"),
    )
    pairs = a.join(F.broadcast(b), F.col("group_a") < F.col("group_b"))
    diff = F.col("m_a") - F.col("m_b")
    return (
        pairs.crossJoin(F.broadcast(msw))
        .select(
            "group_a",
            "group_b",
            "n_a",
            "n_b",
            diff.alias("mean_diff"),
            (
                F.abs(diff)
                / F.sqrt(
                    F.col("msw") / 2.0
                    * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
                )
            ).alias("q_stat"),
        )
        .orderBy("group_a", "group_b")
    )


@register(
    "a_dunn_test",
    # Dunn's test (public 1964 — the post-hoc that follows a
    # significant Kruskal-Wallis, exactly as Tukey HSD follows the
    # ANOVA; using it after KW keeps the whole workflow rank-based):
    # pairwise z_ij = (rbar_i - rbar_j) / sqrt(((n(n+1))/12 -
    # tie_sum/(12(n-1))) * (1/n_i + 1/n_j)) over the SAME global
    # tie-averaged ranks as a_kruskal_wallis (two-level bucket
    # prefix). Mean ranks come from decimal-exact rank sums; the tie
    # term cubes in exact decimal(38,0)/HUGEINT (no int64 wrap past
    # cnt ~2.09e6); each z is one closed-form IEEE tree.
    # Reports z per pair (critical values with Bonferroni/Holm
    # adjustment are lookups outside the engine). Plan: the KW
    # machinery to a 5-row group table, broadcast self-join for the
    # 10 pairs.
    oracle=f"""
WITH vals AS (
  SELECT value, count(*)::BIGINT AS cnt, floor(value)::BIGINT AS bkt
  FROM events GROUP BY 1
),
vt AS (
  SELECT value, event_type, count(*)::BIGINT AS cnt_vt
  FROM events GROUP BY 1, 2
),
bt AS (SELECT bkt, sum(cnt)::BIGINT AS bc FROM vals GROUP BY 1),
off AS (
  SELECT bkt,
         coalesce(sum(bc) OVER (ORDER BY bkt
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS off_c
  FROM bt
),
ranked AS (
  SELECT v.value, v.cnt,
         off.off_c + coalesce(sum(v.cnt) OVER (
             PARTITION BY v.bkt ORDER BY v.value
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + (v.cnt + 1) / 2.0 AS avg_rank
  FROM vals v JOIN off ON v.bkt = off.bkt
),
g AS (
  SELECT vt.event_type,
         sum(vt.cnt_vt)::BIGINT AS n_g,
         {dsum_sql('vt.cnt_vt * r.avg_rank')} AS r_g
  FROM vt JOIN ranked r ON vt.value = r.value
  GROUP BY vt.event_type
),
tie AS (
  SELECT sum(cnt)::BIGINT AS n,
         sum(cnt::HUGEINT * cnt * cnt - cnt)::DOUBLE AS tie_sum
  FROM vals
),
pairs AS (
  SELECT a.event_type AS group_a, b.event_type AS group_b,
         a.n_g AS n_a, b.n_g AS n_b,
         a.r_g / a.n_g - b.r_g / b.n_g AS mean_rank_diff
  FROM g a JOIN g b ON a.event_type < b.event_type
)
SELECT p.group_a, p.group_b, p.n_a, p.n_b, p.mean_rank_diff,
       p.mean_rank_diff
         / sqrt((tie.n * (tie.n + 1) / 12.0
                 - tie.tie_sum / (12.0 * (tie.n - 1)))
                * (1.0 / p.n_a + 1.0 / p.n_b)) AS z_stat
FROM pairs p, tie
ORDER BY p.group_a, p.group_b
""",
    doc="Dunn's post-hoc after Kruskal-Wallis: pairwise z from global "
    "tie-averaged mean ranks with the tie-corrected variance — the "
    "rank-based which-pairs follow-up mirroring Tukey HSD on the "
    "parametric side. Same two-level prefix rank machinery as KW to "
    "a 5-row group table, broadcast pair join; multiplicity "
    "adjustment (Bonferroni/Holm) is a lookup outside the engine.",
    tags=("aggregates", "stats", "extension"),
)
def a_dunn_test(spark, sf_dir):
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    vals = ev.groupBy("value").agg(F.count(F.lit(1)).alias("cnt")).withColumn(
        "bkt", F.floor("value").cast("long")
    )
    vt = ev.groupBy("value", "event_type").agg(F.count(F.lit(1)).alias("cnt_vt"))
    bt = vals.groupBy("bkt").agg(F.sum("cnt").alias("bc"))
    w_b = W.orderBy("bkt").rowsBetween(W.unboundedPreceding, -1)
    off = bt.select(
        "bkt", F.coalesce(F.sum("bc").over(w_b), F.lit(0)).alias("off_c")
    )
    w_l = (
        W.partitionBy("bkt").orderBy("value")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    ranked = vals.join(F.broadcast(off), "bkt").select(
        "value",
        "cnt",
        (
            F.col("off_c")
            + F.coalesce(F.sum("cnt").over(w_l), F.lit(0))
            + (F.col("cnt") + 1) / 2.0
        ).alias("avg_rank"),
    )
    g = (
        vt.join(ranked.select("value", "avg_rank"), "value")
        .groupBy("event_type")
        .agg(
            F.sum("cnt_vt").alias("n_g"),
            dsum(F.col("cnt_vt") * F.col("avg_rank")).alias("r_g"),
        )
        .transform(lineage_cut_lazy)  # both self-join sides
    )
    tie = vals.agg(
        F.sum("cnt").alias("n"),
        # exact decimal cube / HUGEINT oracle twin: no int64 wrap at
        # cnt > ~2.09e6 (see a_mannwhitney_u tie_sum note)
        F.sum(
            F.col("cnt").cast("decimal(38,0)") * F.col("cnt") * F.col("cnt")
            - F.col("cnt")
        ).cast("double").alias("tie_sum"),
    )
    a = g.select(
        F.col("event_type").alias("group_a"),
        F.col("n_g").alias("n_a"),
        (F.col("r_g") / F.col("n_g")).alias("rb_a"),
    )
    b = g.select(
        F.col("event_type").alias("group_b"),
        F.col("n_g").alias("n_b"),
        (F.col("r_g") / F.col("n_g")).alias("rb_b"),
    )
    pairs = a.join(F.broadcast(b), F.col("group_a") < F.col("group_b"))
    n = F.col("n")
    var = (
        n * (n + 1) / 12.0
        - F.col("tie_sum") / (12.0 * (n - 1))
    ) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    diff = F.col("rb_a") - F.col("rb_b")
    return (
        pairs.crossJoin(F.broadcast(tie))
        .select(
            "group_a",
            "group_b",
            "n_a",
            "n_b",
            diff.alias("mean_rank_diff"),
            (diff / F.sqrt(var)).alias("z_stat"),
        )
        .orderBy("group_a", "group_b")
    )
