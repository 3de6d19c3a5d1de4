"""Pipeline query surface — the flagship tank inventory (SURVEY §3.1)
and its fully-oracled UTM variant.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ast_data_pipeline_spark.lineage import lineage_cut_lazy

from ..functions.labels import (
    reclassify_by_size_sql,
    standardize_label_sql,
)
from ..operators.merge import merge_oracle_ctes
from ..operators.spatial import adjacency_predicate_sql
from ..plans.tank_inventory import DIST_LIMIT, tank_inventory
from ..registry import register
from ..sources.catalog import load
from ..sources.domain_views import domain_ctes

_STD = standardize_label_sql("raw_label", "undefined_object")
_RECLASS = reclassify_by_size_sql(
    "cls", "truncated", "difficult", "(gxmax - gxmin)", "(gymax - gymin)"
)

# candidates keep the standardized label (P17 touches clean boxes only);
# clean boxes get the sequential-if reclassification.
_CAND_SQL = f"""
  SELECT annot_id, tile_key, tile_name, image_name, cls AS object_class,
         gxmin, gymin, gxmax, gymax
  FROM (SELECT *, {_STD} AS cls FROM gann)
  WHERE truncated = 1 OR difficult = 1
"""
_CLEAN_SQL = f"""
  SELECT annot_id, tile_key, tile_name, image_name,
         {_RECLASS} AS object_class,
         gxmin, gymin, gxmax, gymax
  FROM (SELECT *, {_STD} AS cls FROM gann)
  WHERE NOT (truncated = 1 OR difficult = 1)
"""

_CTES = (
    domain_ctes("gann", "counties")
    + ","
    + merge_oracle_ctes(_CAND_SQL, _CLEAN_SQL, adjacency_predicate_sql("a", "b", DIST_LIMIT))
)

# Located inventory (everything but the P9/P11 projection stage) as a
# reusable derived-table body — d_inventory_utm selects it directly;
# the flagship oracle wraps it in the Snyder-series staging.
_LOCATED_SQL = """
  SELECT inv.*, c.county_name AS county, c.state_fips, c.county_fips,
         row_number() OVER (
           PARTITION BY inv.tank_id
           ORDER BY (least(inv.utm_maxx, c.c_maxx) - greatest(inv.utm_minx, c.c_minx))
                  * (least(inv.utm_maxy, c.c_maxy) - greatest(inv.utm_miny, c.c_miny))
                  / ((inv.utm_maxx - inv.utm_minx) * (inv.utm_maxy - inv.utm_miny)) DESC,
                  c.state_fips || c.county_fips) AS rn
  FROM (
    SELECT m.component_id AS tank_id, m.object_class, m.tile_name,
           array_to_string(list_sort(m.image_names), ';') AS image_names,
           m.gxmin AS bbox_xmin_px, m.gymin AS bbox_ymin_px,
           m.gxmax AS bbox_xmax_px, m.gymax AS bbox_ymax_px,
           t.utm_projection,
           t.nw_x_utm + m.gxmin::DOUBLE * (t.se_x_utm - t.nw_x_utm) / (t.tile_width::DOUBLE - 1)  AS utm_minx,
           t.nw_y_utm + m.gymax::DOUBLE * (t.se_y_utm - t.nw_y_utm) / (t.tile_height::DOUBLE - 1) AS utm_miny,
           t.nw_x_utm + m.gxmax::DOUBLE * (t.se_x_utm - t.nw_x_utm) / (t.tile_width::DOUBLE - 1)  AS utm_maxx,
           t.nw_y_utm + m.gymin::DOUBLE * (t.se_y_utm - t.nw_y_utm) / (t.tile_height::DOUBLE - 1) AS utm_maxy,
           least(m.gxmax - m.gxmin, m.gymax - m.gymin)::DOUBLE * 0.6 AS diameter,
           m.merged_bbox,
           substr(m.tile_name, 3, 10) AS quad_id,
           string_split(m.tile_name, '_')[-1] AS capture_date
    FROM merged_all m JOIN tiles t ON m.tile_key = t.tile_key
  ) inv
  JOIN counties c
    ON least(inv.utm_maxx, c.c_maxx) > greatest(inv.utm_minx, c.c_minx)
   AND least(inv.utm_maxy, c.c_maxy) > greatest(inv.utm_miny, c.c_miny)
"""

_INVENTORY_UTM_ORACLE = f"""
WITH RECURSIVE
{_CTES}
SELECT tank_id, object_class, tile_name, image_names,
       bbox_xmin_px, bbox_ymin_px, bbox_xmax_px, bbox_ymax_px,
       utm_projection, utm_minx, utm_miny, utm_maxx, utm_maxy,
       diameter, merged_bbox,
       county, state_fips, county_fips, quad_id, capture_date
FROM ({_LOCATED_SQL})
WHERE rn = 1
"""


def _flagship_oracle() -> str:
    from ..functions.geo import utm_lonlat_staged_sql

    located = f"SELECT * FROM ({_LOCATED_SQL}) WHERE rn = 1"
    proj = utm_lonlat_staged_sql(
        located,
        [
            ("c", "(utm_minx + utm_maxx) / 2", "(utm_miny + utm_maxy) / 2"),
            ("nw", "utm_minx", "utm_maxy"),
            ("se", "utm_maxx", "utm_miny"),
        ],
        "substr(utm_projection, 9, 2)::INT",
    )
    # WKT is rebuilt from the SAME %.7f-quantized strings as the
    # published lon/lat columns (self-consistent row, and no second
    # format boundary to straddle — %.9f of the raw doubles hit the
    # predicted ~1-in-100k grid straddle twice at sf0.01).
    # GRID-SNAP before formatting (r12): Java %.7f rounds shortest-repr
    # digits half-up, DuckDB's fmt rounds the exact expansion half-even
    # — identical DOUBLES still formatted differently 2-in-29M at sf1
    # (the second sf1-gate flagship catch, after the libm one). The
    # arithmetic snap (functions/exact.q7) puts the value ON the grid,
    # 5e-8 from either formatter's decision boundary.
    from ..functions.exact import q7_sql

    f7 = lambda c: f"printf('%.7f', {q7_sql(c)})"
    wkt = (
        f"'POLYGON ((' || {f7('lon_nw')} || ' ' || {f7('lat_se')} || ', ' "
        f"|| {f7('lon_se')} || ' ' || {f7('lat_se')} || ', ' "
        f"|| {f7('lon_se')} || ' ' || {f7('lat_nw')} || ', ' "
        f"|| {f7('lon_nw')} || ' ' || {f7('lat_nw')} || ', ' "
        f"|| {f7('lon_nw')} || ' ' || {f7('lat_se')} || '))'"
    )
    return f"""
WITH RECURSIVE
{_CTES}
SELECT tank_id, object_class, tile_name, image_names,
       bbox_xmin_px, bbox_ymin_px, bbox_xmax_px, bbox_ymax_px,
       utm_projection, utm_minx, utm_miny, utm_maxx, utm_maxy,
       {f7('lon_nw')} AS nw_lon, {f7('lat_nw')} AS nw_lat,
       {f7('lon_se')} AS se_lon, {f7('lat_se')} AS se_lat,
       {f7('lon_c')} AS centroid_lon, {f7('lat_c')} AS centroid_lat,
       {wkt} AS geometry_wkt,
       diameter, merged_bbox,
       county, state_fips, county_fips, quad_id, capture_date
FROM ({proj})
"""


@register(
    "flagship_tank_inventory",
    oracle=_flagship_oracle(),
    doc="SURVEY §3.1 flagship: chip annotations -> label pipeline "
    "(P15-P17) -> per-tile CC merge (A1) -> UTM coords/centroid/diameter "
    "(P8/P10/P12) -> county argmax join (J8) -> WGS84 reprojection "
    "(P9, native codegen columns) -> P19 derivations + P11 WKT. "
    "One job, ~4 shuffles. Fully hash-gated (VERDICT r4 #6): the "
    "Snyder series is mirrored op-for-op in DuckDB "
    "(functions/geo.utm_lonlat_staged_sql) INCLUDING the trig — "
    "deterministic psin/pcos polynomials on both sides since r12, "
    "after the sf1 gate caught built-in sin/cos 1-ulp wobble flipping "
    "2-in-29M %.7f-formatted values. lon/lat still cross the contract "
    "boundary as %.7f strings (cm precision, 60x below the 0.6 m "
    "pixel), now backed by bit-identical doubles at every scale. The "
    "raw-double plan (plans/tank_inventory.tank_inventory) is "
    "unchanged for sinks.",
    tags=("domain", "pipeline", "bench"),
)
def flagship_tank_inventory(spark, sf_dir):
    # Contract boundary: the driver's canonicalizer sort_values-crashes
    # on list cells, so the array column goes out sorted + ';'-joined;
    # lon/lat quantize to %.7f strings (see _flagship_oracle).
    from ..functions.exact import fmt7

    inv = tank_inventory(spark, sf_dir).withColumn(
        "image_names", F.array_join(F.array_sort("image_names"), ";")
    )
    # q7 grid-snap + 7-decimal render (fmt7 = byte-identical decimal
    # cast, ~5x cheaper than format_string — see functions/exact.fmt7;
    # the oracle keeps printf('%.7f', q7(...)) verbatim).
    for c in ("nw_lon", "nw_lat", "se_lon", "se_lat", "centroid_lon", "centroid_lat"):
        inv = inv.withColumn(c, fmt7(F.col(c)))
    L = F.lit
    return inv.withColumn(
        "geometry_wkt",
        F.concat(
            L("POLYGON (("),
            F.col("nw_lon"), L(" "), F.col("se_lat"), L(", "),
            F.col("se_lon"), L(" "), F.col("se_lat"), L(", "),
            F.col("se_lon"), L(" "), F.col("nw_lat"), L(", "),
            F.col("nw_lon"), L(" "), F.col("nw_lat"), L(", "),
            F.col("nw_lon"), L(" "), F.col("se_lat"), L("))"),
        ),
    )


@register(
    "d_inventory_utm",
    oracle=_INVENTORY_UTM_ORACLE,
    doc="The flagship pipeline minus the P9/P11 reprojection stage — "
    "every remaining stage (label pipeline, CC merge, coordinate math, "
    "county argmax, derivations) verified end-to-end against DuckDB.",
    tags=("domain", "pipeline"),
)
def d_inventory_utm(spark, sf_dir):
    inv = tank_inventory(spark, sf_dir).withColumn(
        "image_names", F.array_join(F.array_sort("image_names"), ";")
    )
    return inv.select(
        "tank_id", "object_class", "tile_name", "image_names",
        "bbox_xmin_px", "bbox_ymin_px", "bbox_xmax_px", "bbox_ymax_px",
        "utm_projection", "utm_minx", "utm_miny", "utm_maxx", "utm_maxy",
        "diameter", "merged_bbox",
        "county", "state_fips", "county_fips", "quad_id", "capture_date",
    )


@register(
    "x_data_quality_report",
    oracle="""
SELECT 'orders_pk_unique' AS rule,
       (count(*) - count(DISTINCT o_orderkey))::BIGINT AS violations
FROM orders
UNION ALL
SELECT 'orders_totalprice_nonneg',
       count(*) FILTER (WHERE o_totalprice < 0)::BIGINT
FROM orders
UNION ALL
SELECT 'orders_priority_domain',
       count(*) FILTER (WHERE o_orderpriority NOT IN
         ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW'))::BIGINT
FROM orders
UNION ALL
SELECT 'lineitem_qty_in_1_50',
       count(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50)::BIGINT
FROM lineitem
UNION ALL
SELECT 'lineitem_discount_in_0_1',
       count(*) FILTER (WHERE l_discount < 0 OR l_discount > 1)::BIGINT
FROM lineitem
UNION ALL
SELECT 'lineitem_fk_orders',
       (SELECT count(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey))::BIGINT
""",
    doc="Deequ-style data-quality audit: uniqueness, null/domain/range "
    "rules and referential integrity evaluated in one pass per table "
    "(conditional-count aggregates; the FK rule is a left-anti join). "
    "Each rule emits (rule, violations) — the expectations report a "
    "100 TB ingest gate runs before publishing a partition. "
    "Generalizes u4_integrity_check (ref: make-complete-dataset.py "
    "asserts) to a rule catalog.",
    tags=("pipeline", "quality"),
)
def x_data_quality_report(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    prio = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    o_rules = orders.agg(
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias(
            "orders_pk_unique"
        ),
        F.count(F.when(F.col("o_totalprice") < 0, 1)).alias(
            "orders_totalprice_nonneg"
        ),
        F.count(F.when(~F.col("o_orderpriority").isin(prio), 1)).alias(
            "orders_priority_domain"
        ),
    )
    l_rules = li.agg(
        F.count(
            F.when((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1)
        ).alias("lineitem_qty_in_1_50"),
        F.count(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1)
        ).alias("lineitem_discount_in_0_1"),
    )
    orphans = (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("lineitem_fk_orders"))
    )
    wide = o_rules.crossJoin(l_rules).crossJoin(orphans)
    cols = [
        "orders_pk_unique",
        "orders_totalprice_nonneg",
        "orders_priority_domain",
        "lineitem_qty_in_1_50",
        "lineitem_discount_in_0_1",
        "lineitem_fk_orders",
    ]
    return wide.unpivot([], cols, "rule", "violations").select(
        "rule", F.col("violations").cast("long").alias("violations")
    )


@register(
    "x_snapshot_diff",
    # CDC between two deterministic "snapshots" of orders derived in
    # BOTH engines identically: v1 = orders minus keys ending in 9
    # (deletes-to-be), v2 = orders minus keys ending in 7 (the
    # inserts), with keys divisible by 13 getting a shifted priority
    # in v2 (the updates). The diff classifies every key via a
    # full-outer join on the key + md5 row-hash compare — the
    # standard snapshot-reconciliation pass an incremental 100 TB
    # pipeline runs to avoid recomputing unchanged partitions.
    oracle="""
WITH v1 AS (
  SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
  FROM orders WHERE o_orderkey % 10 <> 9
),
v2 AS (
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderkey % 13 = 0 THEN '9-SHIFTED' ELSE o_orderpriority END
           AS o_orderpriority,
         o_totalprice
  FROM orders WHERE o_orderkey % 10 <> 7
),
h1 AS (SELECT o_orderkey,
              md5(o_orderstatus || '|' || o_orderpriority || '|' || o_totalprice::VARCHAR) AS rh
       FROM v1),
h2 AS (SELECT o_orderkey,
              md5(o_orderstatus || '|' || o_orderpriority || '|' || o_totalprice::VARCHAR) AS rh
       FROM v2)
SELECT CASE WHEN h1.o_orderkey IS NULL THEN 'added'
            WHEN h2.o_orderkey IS NULL THEN 'removed'
            WHEN h1.rh <> h2.rh THEN 'changed'
            ELSE 'unchanged' END AS change,
       count(*)::BIGINT AS n_rows,
       min(coalesce(h1.o_orderkey, h2.o_orderkey))::BIGINT AS min_key,
       max(coalesce(h1.o_orderkey, h2.o_orderkey))::BIGINT AS max_key
FROM h1 FULL OUTER JOIN h2 USING (o_orderkey)
GROUP BY 1
""",
    doc="Snapshot diff / CDC classification: full-outer join two table "
    "versions on the key and compare md5 row-hashes — every key "
    "becomes added / removed / changed / unchanged, the "
    "reconciliation pass an incremental pipeline runs before "
    "republishing only changed partitions. Plan: hash the row ONCE "
    "per side (map-side md5 of the concatenated columns), one "
    "co-partitioned full-outer join on the key, tiny aggregate. At "
    "100 TB both snapshots are bucketed on the key, so the join is "
    "shuffle-free and the diff is a linear scan.",
    tags=("pipeline", "extension"),
)
def x_snapshot_diff(spark, sf_dir):
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
    )
    v1 = orders.filter(F.col("o_orderkey") % 10 != 9)
    v2 = orders.filter(F.col("o_orderkey") % 10 != 7).withColumn(
        "o_orderpriority",
        F.when(F.col("o_orderkey") % 13 == 0, "9-SHIFTED").otherwise(
            F.col("o_orderpriority")
        ),
    )
    rh = F.md5(
        F.concat_ws(
            "|",
            F.col("o_orderstatus"),
            F.col("o_orderpriority"),
            F.col("o_totalprice").cast("string"),
        )
    )
    h1 = v1.select("o_orderkey", rh.alias("rh1"))
    h2 = v2.select("o_orderkey", rh.alias("rh2"))
    j = h1.join(h2, "o_orderkey", "full_outer")
    change = (
        F.when(F.col("rh1").isNull(), "added")
        .when(F.col("rh2").isNull(), "removed")
        .when(F.col("rh1") != F.col("rh2"), "changed")
        .otherwise("unchanged")
    )
    return (
        j.select("o_orderkey", change.alias("change"))
        .groupBy("change")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
    )


def _assembly_oracle() -> str:
    from ..operators.dedup import word_shingles_sql
    from .dedup import _curation_ctes

    return f"""
WITH {_curation_ctes()},
survivors AS (
  SELECT doc_id, source, n_tokens
  FROM exact WHERE doc_id NOT IN (SELECT doc_id FROM losers)
),
wds2 AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
bench2 AS (
  SELECT doc_id AS bench_id, w[4:18] AS w
  FROM wds2 WHERE doc_id % 50 = 0 AND len(w) >= 18
),
bsh2 AS (SELECT unnest({word_shingles_sql('w', 13)}) AS shingle FROM bench2),
contam AS (
  SELECT DISTINCT doc_id
  FROM (SELECT doc_id, unnest({word_shingles_sql('w', 13)}) AS shingle
        FROM wds2 WHERE len(w) >= 13) c
  JOIN bsh2 USING (shingle)
)
SELECT s.source,
       CASE WHEN substr(md5(s.doc_id::VARCHAR), 1, 2) < 'cc' THEN 'train'
            WHEN substr(md5(s.doc_id::VARCHAR), 1, 2) < 'e6' THEN 'val'
            ELSE 'test' END AS split,
       count(*)::BIGINT AS n_docs,
       sum(s.n_tokens)::BIGINT AS total_tokens
FROM survivors s
WHERE s.doc_id NOT IN (SELECT doc_id FROM contam)
GROUP BY 1, 2
"""


@register(
    "x_training_assembly",
    oracle=_assembly_oracle(),
    doc="End-to-end training-data ASSEMBLY (the LLM-side §3 driver): "
    "quality gate -> exact dedup -> MinHash near-dup drop (the "
    "x_curation_pipeline stages) -> benchmark decontamination "
    "(13-gram broadcast join, x_decontaminate's rule) -> "
    "deterministic md5 train/val/test split -> per-(source, split) "
    "doc and token census — the manifest a pretraining run consumes. "
    "Every stage is the already-oracled operator composed "
    "declaratively; the whole pipeline is one lazy plan with "
    "shuffle-bounded stages and a broadcast-sized benchmark set.",
    tags=("pipeline", "text", "dedup", "extension"),
)
def x_training_assembly(spark, sf_dir):
    from ..operators.dedup import word_shingles, words_col
    from ..plans.curation import curate

    docs = load(spark, sf_dir, "documents")
    survivors = curate(spark, docs).select("doc_id", "source", "n_tokens")
    # the split-words frame feeds BOTH the benchmark extract and the
    # contamination probe; cut the lineage so the regex split runs once
    # (PROFILE.md r5 tail item)
    wds = docs.select("doc_id", words_col(F.col("text")).alias("w")).transform(
        lineage_cut_lazy
    )
    bench = wds.filter((F.col("doc_id") % 50 == 0) & (F.size("w") >= 18)).select(
        F.slice("w", 4, 15).alias("w")
    )
    bsh = bench.select(F.explode(word_shingles("w", 13)).alias("shingle"))
    contam = (
        wds.filter(F.size("w") >= 13)
        .select("doc_id", F.explode(word_shingles("w", 13)).alias("shingle"))
        .join(F.broadcast(bsh), "shingle")
        .select("doc_id")
        .distinct()
    )
    h2 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = F.when(h2 < "cc", "train").when(h2 < "e6", "val").otherwise("test")
    return (
        survivors.join(contam, "doc_id", "left_anti")
        .groupBy("source", split.alias("split"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )


def _corpus_health_oracle() -> str:
    from ..functions.exact import davg_sql
    from ..operators.text import CHAR_ENTROPY_CTES, quality_score_sql

    return f"""
WITH {CHAR_ENTROPY_CTES},
q AS (
  SELECT doc_id, source, n_chars, md5(lower(text)) AS h,
         {quality_score_sql('w', 'text')} AS quality_score
  FROM (SELECT doc_id, source, n_chars, text,
               string_split(lower(text), ' ') AS w FROM documents)
)
SELECT q.source,
       count(*)::BIGINT AS n_docs,
       sum(q.n_chars)::BIGINT AS total_chars,
       1.0::DOUBLE - count(DISTINCT q.h)::DOUBLE / count(*) AS dup_rate,
       {davg_sql('q.quality_score')} AS avg_quality,
       {davg_sql('ent.entropy_bits')} AS avg_entropy
FROM q JOIN ent ON q.doc_id = ent.doc_id
GROUP BY q.source
"""


@register(
    "x_corpus_health",
    oracle=_corpus_health_oracle(),
    # The governance report a dataset owner reads before shipping a
    # source into a training mix: volume, exact-dup rate, mean
    # heuristic quality, mean character entropy — one row per source,
    # built by composing the engine's dedup/quality/entropy operators
    # in a single lazy plan.
    doc="Per-source corpus health: doc/char volume, exact-dup rate "
    "(two-phase distinct on the content hash), mean Gopher/C4 quality "
    "score, and mean character entropy — all through the exact-decimal "
    "staging so the five-way report hash-matches DuckDB. Plan: the "
    "entropy subframe shuffles on (doc, char) and doc_id; quality is "
    "pure codegen projection; one (doc) join and one |sources|-key "
    "aggregate close it out.",
    tags=("pipeline", "quality", "extension"),
)
def x_corpus_health(spark, sf_dir):
    from ..functions.exact import davg
    from ..operators.text import char_entropy_frame, quality_score

    docs = load(spark, sf_dir, "documents").withColumn(
        "w", F.split(F.lower("text"), " ")
    )
    ent = char_entropy_frame(docs)
    q = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.md5(F.lower("text")).alias("h"),
        quality_score("w", F.col("text")).alias("quality_score"),
    )
    return (
        q.join(ent, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            (
                F.lit(1.0)
                - F.countDistinct("h").cast("double") / F.count(F.lit(1))
            ).alias("dup_rate"),
            davg("quality_score").alias("avg_quality"),
            davg("entropy_bits").alias("avg_entropy"),
        )
    )


def _dataset_card_oracle() -> str:
    from ..functions.exact import davg_sql
    from ..operators.text import quality_score_sql

    return f"""
WITH q AS (
  SELECT doc_id, source, lang, n_chars, md5(lower(text)) AS h,
         len(string_split(text, ' '))::BIGINT AS ws_tokens,
         {quality_score_sql('w', 'text')} AS quality,
         CASE WHEN substr(md5(doc_id::VARCHAR), 1, 2) < 'cc' THEN 'train'
              WHEN substr(md5(doc_id::VARCHAR), 1, 2) < 'e6' THEN 'val'
              ELSE 'test' END AS split
  FROM (SELECT doc_id, source, lang, n_chars, text,
               string_split(lower(text), ' ') AS w FROM documents)
),
lang_top AS (
  SELECT lang FROM q GROUP BY lang
  ORDER BY count(*) DESC, lang LIMIT 1
)
SELECT count(*)::BIGINT AS n_docs,
       count(DISTINCT source)::BIGINT AS n_sources,
       count(DISTINCT lang)::BIGINT AS n_langs,
       (SELECT lang FROM lang_top) AS top_lang,
       sum(ws_tokens)::BIGINT AS total_ws_tokens,
       sum(n_chars)::BIGINT AS total_chars,
       1.0::DOUBLE - count(DISTINCT h)::DOUBLE / count(*) AS exact_dup_rate,
       {davg_sql('quality')} AS mean_quality,
       sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END)::BIGINT AS n_train,
       sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END)::BIGINT AS n_val,
       sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END)::BIGINT AS n_test
FROM q
"""


@register(
    "x_dataset_card",
    oracle=_dataset_card_oracle(),
    doc="The dataset release card: one row with the numbers a dataset "
    "consumer reads first — volume (docs/tokens/chars), source and "
    "language spread with the dominant language, exact-duplicate "
    "rate, mean quality, and the train/val/test split census — all "
    "composed from the engine's already-oracled operators in ONE "
    "aggregation pass over the corpus (plus the tiny top-lang "
    "argmax). The artifact a release pipeline publishes next to the "
    "shard manifest.",
    tags=("pipeline", "text", "extension"),
)
def x_dataset_card(spark, sf_dir):
    from ..functions.exact import davg
    from ..operators.text import quality_score

    docs = load(spark, sf_dir, "documents").withColumn(
        "w", F.split(F.lower("text"), " ")
    )
    h2 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    q = docs.select(
        "doc_id",
        "source",
        "lang",
        "n_chars",
        F.md5(F.lower("text")).alias("h"),
        F.size(F.split("text", " ")).cast("long").alias("ws_tokens"),
        quality_score("w", F.col("text")).alias("quality"),
        F.when(h2 < "cc", "train").when(h2 < "e6", "val").otherwise("test").alias(
            "split"
        ),
    )
    top_lang = (
        q.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "lang")
        .limit(1)
        .select(F.col("lang").alias("top_lang"))
    )
    card = q.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum("ws_tokens").alias("total_ws_tokens"),
        F.sum("n_chars").alias("total_chars"),
        (
            F.lit(1.0) - F.countDistinct("h").cast("double") / F.count(F.lit(1))
        ).alias("exact_dup_rate"),
        davg("quality").alias("mean_quality"),
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0))
        .cast("long")
        .alias("n_train"),
        F.sum(F.when(F.col("split") == "val", 1).otherwise(0))
        .cast("long")
        .alias("n_val"),
        F.sum(F.when(F.col("split") == "test", 1).otherwise(0))
        .cast("long")
        .alias("n_test"),
    )
    return card.crossJoin(F.broadcast(top_lang)).select(
        "n_docs",
        "n_sources",
        "n_langs",
        "top_lang",
        "total_ws_tokens",
        "total_chars",
        "exact_dup_rate",
        "mean_quality",
        "n_train",
        "n_val",
        "n_test",
    )
