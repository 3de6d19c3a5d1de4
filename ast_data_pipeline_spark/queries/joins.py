"""Join query surface (SURVEY.md §2.4: J1-J5; J9 lives in queries/domain.py).

The reference implements all of these as Python loops / set lookups
(nested-loop semi joins at src/az_proc.py:528-561, set-membership at
make-complete-dataset.py:43-47, lookup-update at src/az_proc.py:674-706,
disambiguation at src/form_calcs.py:226-239). Here each is declared as a
DataFrame join and Catalyst picks broadcast/sort-merge; small sides are
broadcast explicitly so the 100 TB plan shuffles only the big fact side.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ast_data_pipeline_spark.lineage import lineage_cut_lazy

from ..functions.exact import dsum, dsum_sql
from ..registry import register
from ..sources.catalog import load


@register(
    "j1_semi_join",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders)
""",
    doc="J1 equi semi join on key (ref: src/az_proc.py:528-542 nested-loop "
    "chip-has-xml scan) as left_semi.",
    tags=("join",),
)
def j1_semi_join(spark, sf_dir):
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
    )


@register(
    "j2_anti_join",
    oracle="""
SELECT p_partkey, p_name FROM part
WHERE p_partkey NOT IN (
  SELECT l_partkey FROM lineitem WHERE l_shipdate >= TIMESTAMP '2000-01-01'
)
""",
    doc="J2 equi anti join (ref: src/az_proc.py:544-561 negatives = chips "
    "minus positives) as left_anti: parts with no recent shipment.",
    tags=("join",),
)
def j2_anti_join(spark, sf_dir):
    part = load(spark, sf_dir, "part")
    recent = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    return (
        part.join(recent, part.p_partkey == recent.l_partkey, "left_anti")
        .select("p_partkey", "p_name")
    )


@register(
    "j3_broadcast_semi",
    oracle=f"""
WITH topparts AS (
  SELECT p_partkey FROM part ORDER BY p_retailprice DESC, p_partkey LIMIT 20
)
SELECT l_partkey,
       count(*)::BIGINT AS n_lines,
       {dsum_sql('l_quantity')} AS sum_qty
FROM lineitem
WHERE l_partkey IN (SELECT p_partkey FROM topparts)
GROUP BY l_partkey
""",
    doc="J3 broadcast-set semi join (ref: make-complete-dataset.py:43-47 "
    "Python-set membership; tile-level-annotation.py:108,115 isin). The "
    "20-key side is broadcast — no shuffle of the fact table.",
    tags=("join", "broadcast"),
)
def j3_broadcast_semi(spark, sf_dir):
    part = load(spark, sf_dir, "part")
    lineitem = load(spark, sf_dir, "lineitem")
    topparts = (
        part.orderBy(F.col("p_retailprice").desc(), "p_partkey")
        .limit(20)
        .select("p_partkey")
    )
    return (
        lineitem.join(
            F.broadcast(topparts), lineitem.l_partkey == topparts.p_partkey, "left_semi"
        )
        .groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum("l_quantity").alias("sum_qty"),
        )
    )


@register(
    "j4_lookup_update_join",
    oracle="""
WITH tracking AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderstatus END AS status
  FROM orders
),
patch AS (
  SELECT o_orderkey, o_orderstatus AS patch_status
  FROM orders WHERE o_orderkey % 14 = 0
)
SELECT t.o_orderkey,
       coalesce(p.patch_status, t.status) AS status_repaired
FROM tracking t LEFT JOIN patch p ON t.o_orderkey = p.o_orderkey
""",
    doc="J4 lookup/update join (ref: src/az_proc.py:674-706 chip-pathway "
    "repair): left join + coalesce(new, old) — the pure-DataFrame form of "
    "an in-place mutate.",
    tags=("join",),
)
def j4_lookup_update_join(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    tracking = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(None)).otherwise(
            F.col("o_orderstatus")
        ).alias("status"),
    )
    patch = (
        orders.filter(F.col("o_orderkey") % 14 == 0)
        .select("o_orderkey", F.col("o_orderstatus").alias("patch_status"))
    )
    return (
        tracking.alias("t")
        .join(F.broadcast(patch.alias("p")), "o_orderkey", "left")
        .select(
            "o_orderkey",
            F.coalesce(F.col("p.patch_status"), F.col("t.status")).alias("status_repaired"),
        )
    )


@register(
    "j5_disambiguating_join",
    oracle="""
SELECT o_custkey,
       o_orderkey AS picked_orderkey,
       n_candidates
FROM (
  SELECT o_custkey, o_orderkey,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn,
         count(*) OVER (PARTITION BY o_custkey)::BIGINT AS n_candidates
  FROM orders
)
WHERE rn = CASE WHEN n_candidates > 1 THEN 2 ELSE 1 END
""",
    doc="J5 disambiguating lookup (ref: src/form_calcs.py:226-239 tile→url "
    "pick-first-or-second): row_number over a per-key window + rank pick.",
    tags=("join", "window"),
)
def j5_disambiguating_join(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wc = Window.partitionBy("o_custkey")
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .withColumn("n_candidates", F.count(F.lit(1)).over(wc))
        .filter(
            F.col("rn") == F.when(F.col("n_candidates") > 1, F.lit(2)).otherwise(F.lit(1))
        )
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("picked_orderkey"),
            "n_candidates",
        )
    )


@register(
    "q5_local_supplier_volume",
    oracle=f"""
SELECT n_name,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
       count(*)::BIGINT AS n_lineitems
FROM region
JOIN nation   ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = n_nationkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1999-01-01'
GROUP BY n_name
ORDER BY revenue DESC
""",
    doc="TPC-H Q5 shape: 6-table star join with a region filter — "
    "Catalyst reorders and broadcasts the dimension chain; the fact "
    "table shuffles once on its join key.",
    tags=("join", "bench"),
)
def q5_local_supplier_volume(spark, sf_dir):
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    lineitem = load(spark, sf_dir, "lineitem")
    supplier = load(spark, sf_dir, "supplier")
    # r14: reduce the dimension chain FIRST and broadcast the result.
    # Catalyst's size estimate for the 3-table dim join is inflated, so
    # without the hint it planned a SortMergeJoin that shuffled the
    # whole lineitem x orders fact by custkey (plans/r14/
    # q5_local_supplier_volume_before.txt: 2 Exchanges + 2 Sorts on the
    # fact path). The reduced chain is just (c_custkey, n_nationkey,
    # n_name) for ASIA customers — broadcast it (guide §3.1: hint when
    # estimates are wrong) and the fact is never row-shuffled. At the
    # 100 TB point the same hint still holds to ~sf1000 (150M custkeys
    # x 16 B ~ 2.4 GB, inside the 8 GB broadcast cap); past that the
    # documented fallback is the Bloom-prefiltered SMJ (SCALING.md).
    dims = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_nationkey", "n_name")
    )
    j = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dims), orders.o_custkey == dims.c_custkey)
        .join(
            F.broadcast(supplier),
            (lineitem.l_suppkey == supplier.s_suppkey)
            & (supplier.s_nationkey == F.col("n_nationkey")),
        )
    )
    return (
        j.groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy(F.col("revenue").desc())
    )


@register(
    "q3_shipping_priority",
    oracle=f"""
SELECT o_orderkey,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate  > TIMESTAMP '1998-03-15'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""",
    doc="TPC-H Q3 shape: selective dim filter + two joins + top-10 by "
    "aggregate. Customer side broadcast; lineitem never shuffled twice.",
    tags=("join", "bench"),
)
def q3_shipping_priority(spark, sf_dir):
    customer = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    lineitem = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        lineitem.join(
            orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey),
            lineitem.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select(
            "o_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
    )


@register(
    "j_scalar_subquery",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_totalprice > (
  SELECT round(sum((o_totalprice)::DECIMAL(30,10)), 4)::DOUBLE
           / count(o_totalprice)
  FROM orders
)
""",
    doc="Uncorrelated scalar subquery: orders above the global average "
    "price. Catalyst plans the subquery as a one-row broadcast "
    "(ReusedSubquery/Scalar subquery in the plan) — no driver-side "
    "two-phase collect. Decimal-exact average on both sides.",
    tags=("join", "subquery"),
)
def j_scalar_subquery(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders_sq")
    return spark.sql(
        """
SELECT o_orderkey, o_totalprice
FROM orders_sq
WHERE o_totalprice > (
  SELECT cast(round(sum(cast(o_totalprice as decimal(30,10))), 4) as double)
           / count(o_totalprice)
  FROM orders_sq
)
"""
    )


@register(
    "j_salted_skew_join",
    oracle=f"""
SELECT o_orderpriority,
       count(*)::BIGINT AS n_items,
       {dsum_sql('l_quantity')} AS sum_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
""",
    doc="Skew-mitigation join under the hash gate: the lineitem-orders "
    "join runs through operators/skew.salted_join (deterministic "
    "xxhash row salt on the big side, n-way explode of the small "
    "side, join on (key, salt)) and must aggregate to EXACTLY the "
    "plain-join result — proving salting is a pure physical rewrite. "
    "The salt spreads one hot key over 8 reducers; AQE's skew join "
    "handles the runtime cases, this is the deterministic fallback "
    "when one key dominates by construction (a mega-tile, a header "
    "hot key).",
    tags=("join", "extension"),
)
def j_salted_skew_join(spark, sf_dir):
    from ..functions.exact import dsum
    from ..operators.skew import salted_join

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    return (
        salted_join(li, orders, "l_orderkey", n_salts=8)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_quantity").alias("sum_qty"),
        )
    )


@register(
    "j_skew_report",
    oracle="""
WITH kc AS (
  SELECT l_orderkey AS key, count(*)::BIGINT AS n_rows
  FROM lineitem GROUP BY 1
),
summary AS (
  SELECT count(*)::BIGINT AS n_keys, sum(n_rows)::BIGINT AS total_rows,
         max(n_rows)::BIGINT AS max_key_rows
  FROM kc
)
SELECT kc.key, kc.n_rows,
       row_number() OVER (ORDER BY kc.n_rows DESC, kc.key)::INT AS rank,
       s.n_keys, s.total_rows,
       (s.max_key_rows * s.n_keys)::DOUBLE / s.total_rows AS skew_factor
FROM kc, summary s
ORDER BY kc.n_rows DESC, kc.key
LIMIT 5
""",
    doc="Join-key skew diagnostic: per-key frequency census -> top-5 "
    "hot keys plus the global skew factor (max key rows / mean key "
    "rows) — the report that decides BETWEEN AQE skew handling, "
    "explicit salting (j_salted_skew_join), and a broadcast rewrite "
    "before a 100 TB join runs. One count shuffle with map-side "
    "combine; the hot-key pick is TakeOrderedAndProject over the "
    "key-cardinality table; the 3-field summary broadcasts. "
    "Integer counts + one int/int division.",
    tags=("join", "extension"),
)
def j_skew_report(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    kc = li.groupBy(F.col("l_orderkey").alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    summary = kc.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n_rows").alias("total_rows"),
        F.max("n_rows").alias("max_key_rows"),
    )
    top = kc.orderBy(F.desc("n_rows"), "key").limit(5)
    w = Window.orderBy(F.desc("n_rows"), "key")
    return (
        top.withColumn("rank", F.row_number().over(w).cast("int"))
        .crossJoin(F.broadcast(summary))
        .select(
            "key", "n_rows", "rank", "n_keys", "total_rows",
            ((F.col("max_key_rows") * F.col("n_keys")).cast("double") / F.col("total_rows"))
            .alias("skew_factor"),
        )
    )


@register(
    "x_entity_resolution",
    oracle="""
WITH canon AS (
  SELECT p_partkey AS entity_id,
         p_name || ' #' || p_partkey::VARCHAR AS name
  FROM part
),
dirty0 AS (
  SELECT entity_id AS dirty_id, name,
         (('0x' || substr(md5('er|' || entity_id::VARCHAR), 1, 6))::BIGINT
          % length(name))::INT + 1 AS pos
  FROM canon WHERE entity_id % 5 = 0
),
dirty AS (
  SELECT dirty_id,
         substr(name, 1, pos - 1) || substr(name, pos + 1) AS dirty_name
  FROM dirty0
),
db AS (
  SELECT dirty_id, dirty_name,
         substr(dirty_name, 1, 3) AS blk_pre,
         substr(dirty_name, length(dirty_name) - 2, 3) AS blk_suf
  FROM dirty
),
cb AS (
  SELECT entity_id, name,
         substr(name, 1, 3) AS blk_pre,
         substr(name, length(name) - 2, 3) AS blk_suf
  FROM canon
),
cand AS (
  SELECT db.dirty_id, db.dirty_name, cb.entity_id, cb.name
  FROM db JOIN cb USING (blk_pre)
  UNION
  SELECT db.dirty_id, db.dirty_name, cb.entity_id, cb.name
  FROM db JOIN cb USING (blk_suf)
),
best AS (
  SELECT dirty_id, entity_id, levenshtein(dirty_name, name)::INT AS lev,
         row_number() OVER (PARTITION BY dirty_id
                            ORDER BY levenshtein(dirty_name, name), entity_id) AS rn
  FROM cand WHERE levenshtein(dirty_name, name) <= 2
)
SELECT dirty_id, entity_id AS matched_id, lev,
       (entity_id = dirty_id) AS is_correct
FROM best WHERE rn = 1
""",
    doc="Entity resolution / record linkage: a deterministically "
    "dirtied entity table (one md5-positioned character deleted from "
    "every 5th name) is matched back to the canonical table via "
    "MULTI-PASS BLOCKING — prefix-3 and suffix-3 block joins unioned "
    "(a single deletion can break one zone but never both), so "
    "candidates are hash-bucketed equi-joins, never all-pairs — then "
    "Levenshtein-verified (edit distance <= 2, identical integer "
    "metric in both engines) and resolved by the (distance, key) rank "
    "chain. is_correct reports resolution accuracy, including honest "
    "ambiguity where a digit deletion lands exactly on another "
    "canonical name.",
    tags=("joins", "dedup", "extension"),
)
def x_entity_resolution(spark, sf_dir):
    canon = load(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("entity_id"),
        F.concat(
            F.col("p_name"), F.lit(" #"), F.col("p_partkey").cast("string")
        ).alias("name"),
    )
    dirty = (
        canon.filter(F.col("entity_id") % 5 == 0)
        .withColumn(
            "pos",
            (
                F.expr(
                    "cast(conv(substring(md5(concat('er|', "
                    "cast(entity_id as string))), 1, 6), 16, 10) as bigint)"
                )
                % F.length("name")
            ).cast("int")
            + 1,
        )
        .select(
            F.col("entity_id").alias("dirty_id"),
            F.expr(
                "concat(substring(name, 1, pos - 1), substring(name, pos + 1))"
            ).alias("dirty_name"),
        )
    )
    db = dirty.select(
        "dirty_id",
        "dirty_name",
        F.substring("dirty_name", 1, 3).alias("blk_pre"),
        F.expr("substring(dirty_name, length(dirty_name) - 2, 3)").alias("blk_suf"),
    )
    cb = canon.select(
        "entity_id",
        "name",
        F.substring("name", 1, 3).alias("blk_pre"),
        F.expr("substring(name, length(name) - 2, 3)").alias("blk_suf"),
    )
    sel = ["dirty_id", "dirty_name", "entity_id", "name"]
    cand = (
        db.join(cb, "blk_pre").select(*sel)
        .unionByName(db.join(cb, "blk_suf").select(*sel))
        .distinct()
    )
    w = Window.partitionBy("dirty_id").orderBy("lev", "entity_id")
    return (
        cand.withColumn("lev", F.levenshtein("dirty_name", "name").cast("int"))
        .filter(F.col("lev") <= 2)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "dirty_id",
            F.col("entity_id").alias("matched_id"),
            "lev",
            (F.col("entity_id") == F.col("dirty_id")).alias("is_correct"),
        )
    )


_RI_RELS = [
    # (label, child table, fk col, parent table, pk col)
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("events->customer", "events", "user_id", "customer", "c_custkey"),
]


def _ri_oracle() -> str:
    parts = []
    for label, child, fk, parent, pk in _RI_RELS:
        parts.append(f"""
SELECT '{label}' AS relationship,
       (SELECT count(*) FROM {child})::BIGINT AS n_child,
       (SELECT count(DISTINCT {fk}) FROM {child})::BIGINT AS n_distinct_fk,
       (SELECT count(*) FROM {child} c
        WHERE NOT EXISTS (SELECT 1 FROM {parent} p WHERE p.{pk} = c.{fk})
       )::BIGINT AS n_orphan_rows,
       (SELECT count(*) FROM {parent})::BIGINT AS n_parent,
       (SELECT count(*) FROM {parent} p
        WHERE EXISTS (SELECT 1 FROM {child} c WHERE c.{fk} = p.{pk})
       )::BIGINT AS n_parent_referenced,
       (SELECT count(*) FROM {parent} p
        WHERE EXISTS (SELECT 1 FROM {child} c WHERE c.{fk} = p.{pk}))::DOUBLE
         / (SELECT count(*) FROM {parent}) AS parent_coverage""")
    return "\nUNION ALL\n".join(parts)


@register(
    "x_referential_integrity",
    oracle=_ri_oracle(),
    doc="Referential-integrity audit across the star schema's five FK "
    "relationships: child row/distinct-FK counts, orphaned child rows "
    "(anti-join to the parent), and parent coverage (parents ever "
    "referenced — semi-join) per relationship. The data-contract "
    "check an ingest pipeline runs before promoting a snapshot; every "
    "probe is a key-partitioned semi/anti join, and the per-relation "
    "results union into one fixed-schema report.",
    tags=("joins", "extension"),
)
def x_referential_integrity(spark, sf_dir):
    out = None
    for label, child, fk, parent, pk in _RI_RELS:
        c = load(spark, sf_dir, child).select(F.col(fk).alias("fk"))
        p = load(spark, sf_dir, parent).select(F.col(pk).alias("pk"))
        stats = c.agg(
            F.count(F.lit(1)).alias("n_child"),
            F.countDistinct("fk").alias("n_distinct_fk"),
        )
        orphans = c.join(p, c.fk == p.pk, "left_anti").agg(
            F.count(F.lit(1)).alias("n_orphan_rows")
        )
        psz = p.agg(F.count(F.lit(1)).alias("n_parent"))
        pref = p.join(c, c.fk == p.pk, "left_semi").agg(
            F.count(F.lit(1)).alias("n_parent_referenced")
        )
        row = (
            stats.crossJoin(orphans)
            .crossJoin(psz)
            .crossJoin(pref)
            .select(
                F.lit(label).alias("relationship"),
                "n_child",
                "n_distinct_fk",
                "n_orphan_rows",
                "n_parent",
                "n_parent_referenced",
                (
                    F.col("n_parent_referenced").cast("double")
                    / F.col("n_parent")
                ).alias("parent_coverage"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


@register(
    "j_null_aware_anti",
    # NOT IN with a NULLABLE subquery — the SQL semantics trap: if the
    # subquery produces even one NULL, `x NOT IN (...)` is never TRUE
    # (three-valued logic), so the correct answer flips from "rows
    # without a match" to EMPTY unless NULLs are filtered. Both
    # branches are computed: the raw NOT IN (Spark plans a
    # null-aware anti join) and the NULL-filtered variant, as a
    # two-row census proving the engine implements the standard.
    # The probe list: each customer's nation key, made NULL for
    # every 7th of the first 40 customers — a probe subset small
    # enough to leave several nations uncovered (real complement).
    oracle="""
WITH probe AS (
  -- first 40 customers only, so several nations stay uncovered and
  -- the filtered branch returns a real complement
  SELECT CASE WHEN c_custkey % 7 = 0 THEN NULL
              ELSE c_nationkey END AS k
  FROM customer WHERE c_custkey < 40
),
raw AS (
  SELECT count(*)::BIGINT AS n FROM nation
  WHERE n_nationkey NOT IN (SELECT k FROM probe)
),
filtered AS (
  SELECT count(*)::BIGINT AS n FROM nation
  WHERE n_nationkey NOT IN (SELECT k FROM probe WHERE k IS NOT NULL)
)
SELECT 'not_in_with_nulls' AS variant, (SELECT n FROM raw) AS n_rows
UNION ALL
SELECT 'not_in_nulls_filtered', (SELECT n FROM filtered)
""",
    doc="Null-aware anti join semantics census: `NOT IN` against a "
    "probe list WITH NULLs must return zero rows (three-valued "
    "logic), while the NULL-filtered variant returns the real "
    "complement — both counts emitted side by side. Spark plans the "
    "raw branch as BroadcastNestedLoopJoin/NullAwareAntiJoin and the "
    "filtered one as a plain left-anti hash join; at 100 TB the "
    "filtered form is the one you want, and this query is the "
    "regression pin that the engine honors the standard either way.",
    tags=("join", "extension"),
)
def j_null_aware_anti(spark, sf_dir):
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    probe = cust.filter(F.col("c_custkey") < 40).select(
        F.when(F.col("c_custkey") % 7 == 0, None)
        .otherwise(F.col("c_nationkey"))
        .alias("k")
    )
    nation.createOrReplaceTempView("_naa_nation")
    probe.createOrReplaceTempView("_naa_probe")
    raw = nation.sparkSession.sql(
        "SELECT count(*) AS n FROM _naa_nation "
        "WHERE n_nationkey NOT IN (SELECT k FROM _naa_probe)"
    )
    filtered = nation.sparkSession.sql(
        "SELECT count(*) AS n FROM _naa_nation "
        "WHERE n_nationkey NOT IN (SELECT k FROM _naa_probe WHERE k IS NOT NULL)"
    )
    return (
        raw.select(
            F.lit("not_in_with_nulls").alias("variant"),
            F.col("n").cast("long").alias("n_rows"),
        )
        .unionByName(
            filtered.select(
                F.lit("not_in_nulls_filtered").alias("variant"),
                F.col("n").cast("long").alias("n_rows"),
            )
        )
    )


FS_SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
FS_M_SEG, FS_M_BAL = 0.9, 0.95  # match-probability parameters


@register(
    "x_fellegi_sunter_linkage",
    # Fellegi-Sunter probabilistic record linkage (JASA 1969, public —
    # the model behind every production linker): a dirty twin of the
    # customer table is derived deterministically (md5-keyed: 20% of
    # records get their balance shifted +-50, 10% get a resampled
    # market segment), candidate pairs are blocked on nationkey, and
    # each pair scores the sum of per-field agreement weights
    # log2(m/u) / log2((1-m)/(1-u)). The u-probabilities (chance
    # agreement among non-matches) are ESTIMATED FROM THE DATA the
    # standard way — sum over values of n_v*(n_v-1) / (N*(N-1)) for
    # the segment field, an exact integer rational; the balance
    # field's u is the blocked-pair within-tolerance rate, also exact
    # counts. Each log2 is quantized %.7f (1-ulp rule); a pair's
    # score is the sum of two quantized doubles (order-free). The
    # census buckets pairs by decision band and counts how many are
    # TRUE matches (same custkey) — the separation table that tells a
    # linker where to put thresholds. Scales: blocking bounds the
    # pair space; u-estimation is one value-frequency aggregate; the
    # weight table is 4 scalars broadcast to the scoring join.
    oracle=f"""
WITH a AS (
  SELECT c_custkey AS k, c_nationkey AS nat, c_mktsegment AS seg, c_acctbal AS bal
  FROM customer
),
b AS (
  SELECT k, nat,
         CASE WHEN h % 10 = 0
              THEN (['AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD','MACHINERY'])[(h // 16) % 5 + 1]
              ELSE seg END AS seg,
         CASE WHEN h % 5 = 0 THEN bal + (h % 100) - 50 ELSE bal END AS bal
  FROM (SELECT *, ('0x' || substr(md5('fs|' || k::VARCHAR), 1, 2))::INT AS h FROM a)
),
useg AS (
  SELECT sum(n * (n - 1))::DOUBLE / (sum(n) * (sum(n) - 1)) AS u
  FROM (SELECT count(*)::BIGINT AS n FROM a GROUP BY seg)
),
pairs AS (
  SELECT a.k AS ka, b.k AS kb,
         (a.seg = b.seg)::INT AS seg_agree,
         (abs(a.bal - b.bal) <= 1.0)::INT AS bal_agree
  FROM a JOIN b ON a.nat = b.nat
),
ubal AS (
  SELECT sum(bal_agree)::DOUBLE / count(*) AS u
  FROM pairs WHERE ka <> kb
),
w AS (
  SELECT printf('%.7f', log2({FS_M_SEG!r} / useg.u))::DOUBLE AS w_seg_a,
         printf('%.7f', log2((1.0 - {FS_M_SEG!r}) / (1.0 - useg.u)))::DOUBLE AS w_seg_d,
         printf('%.7f', log2({FS_M_BAL!r} / ubal.u))::DOUBLE AS w_bal_a,
         printf('%.7f', log2((1.0 - {FS_M_BAL!r}) / (1.0 - ubal.u)))::DOUBLE AS w_bal_d
  FROM useg, ubal
),
scored AS (
  SELECT ka, kb,
         (CASE WHEN seg_agree = 1 THEN w.w_seg_a ELSE w.w_seg_d END)
         + (CASE WHEN bal_agree = 1 THEN w.w_bal_a ELSE w.w_bal_d END) AS score,
         (ka = kb)::INT AS is_true
  FROM pairs, w
)
SELECT CASE WHEN score >= 4.0 THEN 'a_match'
            WHEN score <= -4.0 THEN 'c_non_match'
            ELSE 'b_possible' END AS decision,
       count(*)::BIGINT AS n_pairs,
       sum(is_true)::BIGINT AS n_true_pairs,
       sum(is_true)::DOUBLE / count(*) AS true_share
FROM scored GROUP BY 1
""",
    doc="Fellegi-Sunter linkage scoring: deterministic dirty twin of "
    "the customer table, nationkey-blocked candidate pairs, per-field "
    "agreement weights log2(m/u) with u estimated exactly from value "
    "frequencies, pairs bucketed into match / possible / non-match "
    "bands with true-match (same key) counts — the threshold-setting "
    "separation table of probabilistic record linkage. Broadcast "
    "4-scalar weight table; blocking bounds the candidate space.",
    tags=("joins", "dedup", "extension"),
)
def x_fellegi_sunter_linkage(spark, sf_dir):
    a = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_nationkey").alias("nat"),
        F.col("c_mktsegment").alias("seg"),
        F.col("c_acctbal").alias("bal"),
    )
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("fs|"), F.col("k").cast("string"))), 1, 2),
        16,
        10,
    ).cast("int")
    segs = F.array(*[F.lit(s) for s in FS_SEGMENTS])
    b = a.withColumn("h", h).select(
        "k",
        "nat",
        F.when(
            F.col("h") % 10 == 0,
            F.element_at(segs, ((F.col("h") / 16).cast("int") % 5) + 1),
        )
        .otherwise(F.col("seg"))
        .alias("seg"),
        F.when(F.col("h") % 5 == 0, F.col("bal") + (F.col("h") % 100) - 50)
        .otherwise(F.col("bal"))
        .alias("bal"),
    )
    pairs = (
        a.alias("a")
        .join(b.alias("b"), F.col("a.nat") == F.col("b.nat"))
        .select(
            F.col("a.k").alias("ka"),
            F.col("b.k").alias("kb"),
            (F.col("a.seg") == F.col("b.seg")).cast("int").alias("seg_agree"),
            (F.abs(F.col("a.bal") - F.col("b.bal")) <= 1.0)
            .cast("int")
            .alias("bal_agree"),
        )
        .transform(lineage_cut_lazy)  # consumed by ubal and scoring
    )
    useg = (
        a.groupBy("seg")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            (
                F.sum(F.col("n") * (F.col("n") - 1)).cast("double")
                / (F.sum("n") * (F.sum("n") - 1))
            ).alias("u_seg")
        )
    )
    ubal = pairs.filter(F.col("ka") != F.col("kb")).agg(
        (F.sum("bal_agree").cast("double") / F.count(F.lit(1))).alias("u_bal")
    )
    q = lambda c: F.format_string("%.7f", c).cast("double")
    w = (
        useg.crossJoin(ubal)
        .select(
            q(F.log2(F.lit(FS_M_SEG) / F.col("u_seg"))).alias("w_seg_a"),
            q(F.log2(F.lit(1.0 - FS_M_SEG) / (F.lit(1.0) - F.col("u_seg")))).alias(
                "w_seg_d"
            ),
            q(F.log2(F.lit(FS_M_BAL) / F.col("u_bal"))).alias("w_bal_a"),
            q(F.log2(F.lit(1.0 - FS_M_BAL) / (F.lit(1.0) - F.col("u_bal")))).alias(
                "w_bal_d"
            ),
        )
    )
    score = F.when(F.col("seg_agree") == 1, F.col("w_seg_a")).otherwise(
        F.col("w_seg_d")
    ) + F.when(F.col("bal_agree") == 1, F.col("w_bal_a")).otherwise(F.col("w_bal_d"))
    # Thresholds sit between the four discrete score levels this
    # 2-field model produces (-7.3 both-disagree, -2.1 seg-only-agree,
    # +9.1 bal-only-agree, +14.3 both-agree at sf0.01): +-4 makes
    # every band REACHABLE — 'possible' = segment agrees but balance
    # doesn't, the genuinely ambiguous case (r7 ADVICE lesson: a
    # bucket no input can reach is a silent spec bug).
    decision = (
        F.when(score >= 4.0, "a_match")
        .when(score <= -4.0, "c_non_match")
        .otherwise("b_possible")
    )
    return (
        pairs.crossJoin(F.broadcast(w))
        .select(
            decision.alias("decision"),
            (F.col("ka") == F.col("kb")).cast("int").alias("is_true"),
        )
        .groupBy("decision")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("is_true").cast("long").alias("n_true_pairs"),
            (F.sum("is_true").cast("double") / F.count(F.lit(1))).alias("true_share"),
        )
    )


IVM_CUT_SHIP = "1998-01-01"   # lineitem-side delta: late shipments
IVM_CUT_ORDER = "1997-01-01"  # orders-side delta: recent orders


@register(
    "j_delta_join_maintenance",
    # Incremental view maintenance for a JOIN view (the delta-join
    # algebra every streaming/materialized-view engine implements):
    # with A = lineitem split at a ship-date cutoff and B = orders
    # split at an order-date cutoff,
    #   A ⋈ B = A_old⋈B_old  ∪  dA⋈B_old  ∪  A_old⋈dB  ∪  dA⋈dB
    # — the first term is the STANDING view state; a refresh touches
    # only the three delta terms (each bounded by |dA| or |dB|, not
    # the fact tables). The Spark side computes the four quadrant
    # joins separately, partial-aggregates each (counts + raw DECIMAL
    # sums), and merges partials with ONE final round — exact-decimal
    # addition is associative, so maintained == recomputed
    # bit-for-bit. The oracle IS the full recompute; the per-quadrant
    # row counts are exposed as columns so the gate also pins the
    # decomposition's disjointness (quadrants must sum to n_rows).
    oracle=f"""
SELECT o.o_orderpriority,
       count(*)::BIGINT AS n_rows,
       sum(CASE WHEN l.l_shipdate < DATE '{IVM_CUT_SHIP}'
                 AND o.o_orderdate < DATE '{IVM_CUT_ORDER}'
                THEN 1 ELSE 0 END)::BIGINT AS n_old_old,
       sum(CASE WHEN l.l_shipdate >= DATE '{IVM_CUT_SHIP}'
                 AND o.o_orderdate < DATE '{IVM_CUT_ORDER}'
                THEN 1 ELSE 0 END)::BIGINT AS n_da_bold,
       sum(CASE WHEN l.l_shipdate < DATE '{IVM_CUT_SHIP}'
                 AND o.o_orderdate >= DATE '{IVM_CUT_ORDER}'
                THEN 1 ELSE 0 END)::BIGINT AS n_aold_db,
       sum(CASE WHEN l.l_shipdate >= DATE '{IVM_CUT_SHIP}'
                 AND o.o_orderdate >= DATE '{IVM_CUT_ORDER}'
                THEN 1 ELSE 0 END)::BIGINT AS n_da_db,
       round(sum(l.l_extendedprice::DECIMAL(30,10)), 4)::DOUBLE AS total_price
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
""",
    doc="Delta-join view maintenance: the join view's aggregate is "
    "maintained from four quadrant joins (standing old x old state "
    "plus three delta terms) whose decimal partials merge with one "
    "final round — and must equal the oracle's full recompute "
    "exactly. At 100 TB a refresh reads only the deltas; the exposed "
    "per-quadrant counts pin the decomposition's disjointness.",
    tags=("joins", "streaming", "extension"),
)
def j_delta_join_maintenance(spark, sf_dir):
    from ..functions.exact import DEC, RSCALE

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_shipdate"
    )
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    a_old = li.filter(F.col("l_shipdate") < IVM_CUT_SHIP)
    d_a = li.filter(F.col("l_shipdate") >= IVM_CUT_SHIP)
    b_old = orders.filter(F.col("o_orderdate") < IVM_CUT_ORDER)
    d_b = orders.filter(F.col("o_orderdate") >= IVM_CUT_ORDER)

    def partial(a, b, term):
        return (
            a.join(b, a["l_orderkey"] == b["o_orderkey"])
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("l_extendedprice").cast(DEC)).alias("s"),
            )
            .withColumn("term", F.lit(term))
        )

    parts = (
        partial(a_old, b_old, "old_old")
        .unionByName(partial(d_a, b_old, "da_bold"))
        .unionByName(partial(a_old, d_b, "aold_db"))
        .unionByName(partial(d_a, d_b, "da_db"))
    )
    zero = F.lit(0).cast(DEC)

    def term_n(t):
        return (
            F.sum(F.when(F.col("term") == t, F.col("n")).otherwise(0))
            .cast("long")
            .alias(f"n_{t}")
        )

    return parts.groupBy("o_orderpriority").agg(
        F.sum("n").cast("long").alias("n_rows"),
        term_n("old_old"),
        term_n("da_bold"),
        term_n("aold_db"),
        term_n("da_db"),
        F.round(F.sum(F.coalesce(F.col("s"), zero)), RSCALE)
        .cast("double")
        .alias("total_price"),
    )


SNM_WINDOW = 3  # sorted-neighborhood half-window (pairs within 3 ranks)


@register(
    "x_sorted_neighborhood_linkage",
    # Sorted-neighborhood blocking — the other classic candidate-
    # generation discipline next to key blocking (Fellegi-Sunter
    # query) and LSH banding (minhash family): sort records by a
    # composite key, compare only records within a fixed rank window
    # w, so candidates are O(N*w) instead of O(N^2) and the sort
    # clusters likely matches adjacently. Here: parts sorted by name
    # within brand (the window is PARTITIONED — per-brand
    # neighborhoods, no global single-reducer sort), w=3, verified by
    # distinct-shared-word count >= 1. The rank-offset join is an
    # equi-join on (brand, rank+off) per offset 1..w — a bounded
    # explode, never a range BNLJ. Oracle mirrors rank + offset join.
    oracle=f"""
WITH ranked AS (
  SELECT p_partkey, p_brand, p_name,
         row_number() OVER (PARTITION BY p_brand
                            ORDER BY p_name, p_partkey) AS rk
  FROM part
),
cand AS (
  SELECT a.p_brand,
         len(list_intersect(list_distinct(string_split(a.p_name, ' ')),
                            list_distinct(string_split(b.p_name, ' '))))
           AS shared_words
  FROM ranked a
  JOIN unnest(generate_series(1, {SNM_WINDOW})) t(off) ON true
  JOIN ranked b ON b.p_brand = a.p_brand AND b.rk = a.rk + t.off
)
SELECT p_brand,
       count(*)::BIGINT AS n_candidates,
       count(*) FILTER (WHERE shared_words >= 1)::BIGINT AS n_matches,
       (count(*) FILTER (WHERE shared_words >= 1))::DOUBLE / count(*)
         AS match_share
FROM cand GROUP BY p_brand
""",
    doc="Sorted-neighborhood candidate generation for record linkage: "
    "per-brand name sort, fixed rank window w=3, shared-word verify — "
    "O(N*w) candidate pairs via bounded rank-offset equi-joins "
    "(the sliding-window alternative to key blocking and LSH "
    "banding). Reports candidate volume and verified-match share per "
    "brand.",
    tags=("joins", "extension"),
)
def x_sorted_neighborhood_linkage(spark, sf_dir):
    part = load(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy("p_name", "p_partkey")
    ranked = part.select(
        "p_partkey", "p_brand", "p_name", F.row_number().over(w).alias("rk")
    ).transform(lineage_cut_lazy)  # both sides of the offset join
    offs = F.explode(
        F.sequence(F.lit(1), F.lit(SNM_WINDOW))
    ).alias("off")
    probe = ranked.select(
        "p_brand", "p_name", "rk", offs
    ).withColumn("rk_b", F.col("rk") + F.col("off"))
    b = ranked.select(
        F.col("p_brand").alias("b_brand"),
        F.col("p_name").alias("b_name"),
        F.col("rk").alias("b_rk"),
    )
    shared = F.size(
        F.array_intersect(
            F.array_distinct(F.split("p_name", " ")),
            F.array_distinct(F.split("b_name", " ")),
        )
    )
    cand = probe.join(
        b,
        (F.col("b_brand") == F.col("p_brand")) & (F.col("b_rk") == F.col("rk_b")),
    ).select("p_brand", shared.alias("shared_words"))
    return cand.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.sum(F.when(F.col("shared_words") >= 1, 1).otherwise(0))
        .cast("long")
        .alias("n_matches"),
        (
            F.sum(F.when(F.col("shared_words") >= 1, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1))
        ).alias("match_share"),
    )
