"""Spatial query surface (SURVEY.md §2.4 J6-J8, P13/P14, P20 + the
distribution-by-county reporting query of §3.3).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.labels import CANONICAL_CLASSES, standardize_label, standardize_label_sql
from ..operators.aggregates import crosstab_with_margins
from ..operators.spatial import (
    ARGMAX_COUNTY_SQL_BODY,
    adjacency_predicate,
    adjacency_predicate_sql,
    assign_county_argmax,
    morton_key,
    morton_key_sql,
)
from ..registry import register
from ..sources.catalog import load
from ..sources.domain_views import counties, g_annotations, tiles, with_domain

DIST_LIMIT = 5  # merge distance in px (ref tile-level-annotation.py:53-54)


@register(
    "d_j6_point_in_tile",
    oracle=with_domain(
        """
SELECT c_custkey, tile_name
FROM (
  SELECT c_custkey,
         400000.0 + (c_custkey * 977 % 125000)::DOUBLE AS px,
         3900000.0 + (c_custkey * 131 % 105000)::DOUBLE AS py
  FROM customer
) p JOIN tiles t
  ON p.px > t.nw_x_utm AND p.px < t.se_x_utm
 AND p.py < t.nw_y_utm AND p.py > t.se_y_utm
""",
        "tiles",
    ),
    doc="J6 spatial point-in-polygon join (ref: src/az_proc.py:133-191 "
    "rtree lookup, rejecting edge-overlap-only matches -> strict "
    "inequalities). Tile side broadcast: range-predicate join, no "
    "shuffle of the point side.",
    tags=("domain", "spatial", "join"),
)
def d_j6_point_in_tile(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    pts = cust.select(
        "c_custkey",
        (400000.0 + (F.col("c_custkey") * 977 % 125000).cast("double")).alias("px"),
        (3900000.0 + (F.col("c_custkey") * 131 % 105000).cast("double")).alias("py"),
    )
    t = tiles(spark, sf_dir)
    cond = (
        (F.col("px") > F.col("nw_x_utm"))
        & (F.col("px") < F.col("se_x_utm"))
        & (F.col("py") < F.col("nw_y_utm"))
        & (F.col("py") > F.col("se_y_utm"))
    )
    return pts.join(F.broadcast(t), cond).select("c_custkey", "tile_name")


@register(
    "d_j7_adjacency_pairs",
    oracle=with_domain(
        f"""
SELECT a.tile_name,
       a.annot_id AS a_id, b.annot_id AS b_id,
       least(a.gxmin, b.gxmin) AS m_xmin,
       least(a.gymin, b.gymin) AS m_ymin,
       greatest(a.gxmax, b.gxmax) AS m_xmax,
       greatest(a.gymax, b.gymax) AS m_ymax
FROM (SELECT * FROM gann WHERE truncated = 1 OR difficult = 1) a
JOIN (SELECT * FROM gann WHERE truncated = 1 OR difficult = 1) b
  ON a.tile_name = b.tile_name AND a.annot_id < b.annot_id
WHERE {adjacency_predicate_sql('a', 'b', DIST_LIMIT)}
""",
        "gann",
    ),
    doc="J7 self adjacency theta-join within tile (ref: src/form_calcs.py:"
    "753-760 all-pairs j>i loop) with P14 predicate + P13 pairwise union "
    "bbox (src/form_calcs.py:699-713). Feeds the A1 merge.",
    tags=("domain", "spatial", "join"),
)
def d_j7_adjacency_pairs(spark, sf_dir):
    g = g_annotations(spark, sf_dir)
    cand = g.filter((F.col("truncated") == 1) | (F.col("difficult") == 1))
    a, b = cand.alias("a"), cand.alias("b")
    pairs = a.join(
        b,
        (F.col("a.tile_name") == F.col("b.tile_name"))
        & (F.col("a.annot_id") < F.col("b.annot_id"))
        & adjacency_predicate("a", "b", DIST_LIMIT),
    )
    return pairs.select(
        F.col("a.tile_name").alias("tile_name"),
        F.col("a.annot_id").alias("a_id"),
        F.col("b.annot_id").alias("b_id"),
        F.least("a.gxmin", "b.gxmin").alias("m_xmin"),
        F.least("a.gymin", "b.gymin").alias("m_ymin"),
        F.greatest("a.gxmax", "b.gxmax").alias("m_xmax"),
        F.greatest("a.gymax", "b.gymax").alias("m_ymax"),
    )


@register(
    "d_j8_county_argmax",
    oracle=with_domain(
        f"""
SELECT annot_id, county_name,
       state_fips || county_fips AS county_id,
       state_fips, county_fips, overlap_frac
FROM ({ARGMAX_COUNTY_SQL_BODY})
WHERE rn = 1
""",
        "gann",
        "counties",
    ),
    doc="J8 polygon-intersects join with argmax-overlap tie-break (ref: "
    "src/form_calcs.py:992-1037 O(tanks x counties) loop): broadcast "
    "range join + row_number argmax; P20 FIPS concat "
    "(src/form_calcs.py:1035).",
    tags=("domain", "spatial", "join", "bench"),
)
def d_j8_county_argmax(spark, sf_dir):
    # slim the tank side before the join: the argmax groups by the full
    # tank row, so carrying only the needed columns keeps the shuffle narrow
    # r14: carry tile_key and group the argmax on (tile_key, annot_id)
    # — annot_id determines its tile, so the groups are unchanged, but
    # the bench profile's tile_key-bucketed gann scan now satisfies the
    # aggregation's distribution and the argmax Exchange disappears
    # (see assign_county_argmax docstring).
    g = g_annotations(spark, sf_dir).select(
        "tile_key", "annot_id", "utm_minx", "utm_miny", "utm_maxx", "utm_maxy"
    )
    c = counties(spark, sf_dir)
    out = assign_county_argmax(g, c, extra_group_cols=("tile_key",))
    return out.select(
        "annot_id",
        "county_name",
        F.concat("state_fips", "county_fips").alias("county_id"),
        "state_fips",
        "county_fips",
        "overlap_frac",
    )


def _distribution_oracle() -> str:
    cells = ",\n       ".join(
        f"""sum(CASE WHEN object_class = '{c}' THEN 1 ELSE 0 END)::BIGINT AS "{c}" """
        for c in CANONICAL_CLASSES
    )
    sums = ",\n       ".join(f'sum("{c}")::BIGINT AS "{c}"' for c in CANONICAL_CLASSES)
    return with_domain(
        f"""
SELECT * FROM (
  WITH located AS (
    SELECT state_fips || county_fips AS county_id,
           {standardize_label_sql('raw_label', 'undefined_object')} AS object_class
    FROM ({ARGMAX_COUNTY_SQL_BODY})
    WHERE rn = 1
  ),
  p AS (
    SELECT county_id,
       {cells},
       count(*)::BIGINT AS "Total"
    FROM located GROUP BY county_id
  ),
  m AS (
    SELECT 'Total' AS county_id,
       {sums},
       sum("Total")::BIGINT AS "Total"
    FROM p
  )
  SELECT * FROM p UNION ALL SELECT * FROM m
)
""",
        "gann",
        "counties",
    )


@register(
    "d_distribution_by_county",
    oracle=_distribution_oracle(),
    doc="The SURVEY §3.3 reporting query (distribution_by_county_state.py:"
    "26-48): locate every tank in its county (J8 argmax), then A3 "
    "crosstab county_id x object_class with Total margins, sorted by "
    "Total desc (O1).",
    tags=("domain", "spatial", "pivot", "bench"),
)
def d_distribution_by_county(spark, sf_dir):
    # r14: same (tile_key, annot_id) group-key trick as d_j8 — the
    # bucketed gann scan absorbs the argmax exchange in the bench
    # profile (groups unchanged: annot_id is row-unique).
    g = g_annotations(spark, sf_dir).select(
        "tile_key", "annot_id", "utm_minx", "utm_miny", "utm_maxx", "utm_maxy",
        standardize_label(F.col("raw_label"), "undefined_object").alias("object_class"),
    )
    located = assign_county_argmax(
        g, counties(spark, sf_dir), payload_cols=["object_class"],
        extra_group_cols=("tile_key",),
    ).select(
        F.concat("state_fips", "county_fips").alias("county_id"), "object_class"
    )
    return crosstab_with_margins(
        located, "county_id", "object_class", list(CANONICAL_CLASSES)
    )


@register(
    "d_j8_grid_cell_pairs",
    oracle=with_domain(
        """
SELECT g.annot_id, c.county_name,
       c.state_fips || c.county_fips AS fips
FROM gann g JOIN counties c
  ON least(g.utm_maxx, c.c_maxx) > greatest(g.utm_minx, c.c_minx)
 AND least(g.utm_maxy, c.c_maxy) > greatest(g.utm_miny, c.c_miny)
""",
        "gann",
        "counties",
    ),
    doc="J8's intersect join re-planned for a NON-broadcastable polygon "
    "side: PBSM grid-cell equi-join (operators/spatial."
    "grid_cell_intersect_join) with reference-point dedup — no "
    "BroadcastNestedLoopJoin, no distinct. Oracle is the plain theta "
    "join; results must be identical to the broadcast path.",
    tags=("domain", "spatial", "join", "scale"),
)
def d_j8_grid_cell_pairs(spark, sf_dir):
    from ..operators.spatial import grid_cell_intersect_join
    from ..sources.domain_views import g_annotations

    tanks = g_annotations(spark, sf_dir).select(
        "annot_id", "utm_minx", "utm_miny", "utm_maxx", "utm_maxy"
    )
    cts = counties(spark, sf_dir)
    pairs = grid_cell_intersect_join(
        tanks,
        cts,
        ("utm_minx", "utm_miny", "utm_maxx", "utm_maxy"),
        ("c_minx", "c_miny", "c_maxx", "c_maxy"),
        cell=10000.0,
    )
    return pairs.select(
        "annot_id",
        "county_name",
        F.concat("state_fips", "county_fips").alias("fips"),
    )


ZCELL = 1000.0  # m; 16-bit cell coords hold for any UTM zone extent


@register(
    "d_zorder_layout",
    oracle=with_domain(
        f"""
SELECT annot_id,
       floor(centroid_x / {ZCELL})::BIGINT AS cx,
       floor(centroid_y / {ZCELL})::BIGINT AS cy,
       {morton_key_sql(f'floor(centroid_x / {ZCELL})::BIGINT', f'floor(centroid_y / {ZCELL})::BIGINT')} AS zkey
FROM gann
""",
        "gann",
    ),
    doc="Z-order (Morton) layout key over the annotation centroids — "
    "the write-side clustering key for 100 TB spatial locality: sort or "
    "range-partition by zkey before writing and a bbox query prunes to "
    "the touched cells via parquet min/max file skipping. Pure bit "
    "interleave (operators/spatial.morton_key), oracle mirrors it "
    "bit-for-bit.",
    tags=("domain", "spatial", "layout"),
)
def d_zorder_layout(spark, sf_dir):
    g = g_annotations(spark, sf_dir)
    cx = F.floor(F.col("centroid_x") / ZCELL)
    cy = F.floor(F.col("centroid_y") / ZCELL)
    return g.select(
        "annot_id",
        cx.alias("cx"),
        cy.alias("cy"),
        morton_key(cx, cy).alias("zkey"),
    )
