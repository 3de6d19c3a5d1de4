"""Deterministic domain-shaped views derived from the driver testdata.

The reference's data model (SURVEY.md §1.1: tiles, images/chips,
annotations, counties) does not exist in the driver's parquet tables,
so the engine derives it deterministically from them with pure integer
arithmetic — identical in Spark (builders below) and DuckDB (CTE text
in ``SQL``), which lets every domain operator keep a real oracle.

Shapes (FIXTURES.md):
- ``tiles``       1 row per ``part`` row: NAIP-style tile_name
  ``m_{quad}_{corner}_{zone}_1_{yyyymmdd}``, non-512-multiple dims,
  two UTM zones, corner coords with 0.6 m/px resolution.
- ``images``      chip grid per tile (ceil(h/512) x ceil(w/512)),
  name ``{tile_name}_{row:02}_{col:02}`` (ref src/az_proc.py:522),
  pixel bbox clamped with the reference's ``>`` quirk
  (src/form_calcs.py:506-509).
- ``annotations`` 1 row per ``lineitem`` row: VOC-style 1-indexed
  chip-local bbox, raw label drawn from the reference's 20-variant
  map plus one unknown, truncated/difficult bits.
- ``counties``    1 row per ``nation`` row: overlapping UTM-space
  rectangles + zero-padded FIPS codes.
"""

from __future__ import annotations

import os
import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.labels import OBJECT_DICT
from .catalog import load

RESOLUTION_M = 0.6  # NAIP 60cm GSD (ref src/az_proc.py:247)
CHIP = 512

LABEL_VARIANTS = [*OBJECT_DICT.keys(), "mystery_tank"]  # 21 wide, last unknown

CORNERS = ["ne", "nw", "se", "sw"]


def tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    pk = F.col("p_partkey")
    quad = 3008600 + pk  # unique per part -> tile_name globally unique
    corner = F.element_at(F.array(*[F.lit(c) for c in CORNERS]), (pk % 4 + 1).cast("int"))
    zone = (16 + pk % 2).cast("int")
    cdate = (2018 + pk % 3) * 10000 + (1 + pk % 12) * 100 + (1 + pk % 28)
    width = (1024 + (pk * 37) % 2000).cast("int")
    height = (1024 + (pk * 53) % 2000).cast("int")
    nw_x = 400000.0 + (pk % 50).cast("double") * 2400.0
    nw_y = 4000000.0 - ((pk * 7) % 40).cast("double") * 2400.0
    return load(spark, sf_dir, "part").select(
        F.concat_ws(
            "_", F.lit("m"), quad.cast("string"), corner, zone.cast("string"),
            F.lit("1"), cdate.cast("string"),
        ).alias("tile_name"),
        width.alias("tile_width"),
        height.alias("tile_height"),
        (3 + pk % 2).cast("int").alias("tile_bands"),
        F.concat(F.lit("EPSG:269"), zone.cast("string")).alias("utm_projection"),
        nw_x.alias("nw_x_utm"),
        nw_y.alias("nw_y_utm"),
        (nw_x + width.cast("double") * RESOLUTION_M).alias("se_x_utm"),
        (nw_y - height.cast("double") * RESOLUTION_M).alias("se_y_utm"),
        pk.alias("tile_key"),
    )


def images(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tiles(spark, sf_dir)
    rows_n = F.floor((F.col("tile_height") + CHIP - 1) / CHIP).cast("int")
    cols_n = F.floor((F.col("tile_width") + CHIP - 1) / CHIP).cast("int")
    g = (
        t.withColumn("row_index", F.explode(F.sequence(F.lit(0), rows_n - 1)))
        .withColumn("col_index", F.explode(F.sequence(F.lit(0), cols_n - 1)))
    )
    row_i, col_i = F.col("row_index"), F.col("col_index")
    return g.select(
        F.concat_ws(
            "_",
            F.col("tile_name"),
            F.lpad(row_i.cast("string"), 2, "0"),
            F.lpad(col_i.cast("string"), 2, "0"),
        ).alias("image_name"),
        "tile_name",
        "tile_key",
        row_i,
        col_i,
        (col_i * CHIP).alias("minx_px"),
        (row_i * CHIP).alias("miny_px"),
        # the reference clamps with `>` not `>=` (src/form_calcs.py:506-509):
        # an exactly-at-edge max stays at tile_width/height, so least()
        # reproduces its arithmetic exactly.
        F.least((col_i + 1) * CHIP - 1, F.col("tile_width")).alias("maxx_px"),
        F.least((row_i + 1) * CHIP - 1, F.col("tile_height")).alias("maxy_px"),
    )


def annotations(spark: SparkSession, sf_dir: str) -> DataFrame:
    # every derived column is a function of these four keys, so dedup
    # happens BEFORE the join on the narrowest possible projection —
    # at scale this is a 4-int-column shuffle instead of a wide-row one.
    # r14 scan-parallelism floor (sources/parallel.dedup_floor): on the
    # one-row-group testdata layout the dedup's partial aggregate — a
    # hash table over every annotation key — runs fused into the
    # single-core lineitem scan; pre-partitioning on the dedup columns
    # moves it post-exchange (32-way) without adding an exchange (the
    # distinct reuses this partitioning). Keys are unique in practice,
    # so the shuffle carries the same bytes either way; gate is footer-
    # metadata-driven and a no-op on healthy layouts.
    from .parallel import dedup_floor

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    li = dedup_floor(
        spark, sf_dir, "lineitem", li,
        ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"],
    ).dropDuplicates()
    t = tiles(spark, sf_dir)
    j = li.join(t, li.l_partkey == t.tile_key)
    ok, ln, sk = F.col("l_orderkey"), F.col("l_linenumber"), F.col("l_suppkey")
    rows_n = F.floor((F.col("tile_height") + CHIP - 1) / CHIP).cast("int")
    cols_n = F.floor((F.col("tile_width") + CHIP - 1) / CHIP).cast("int")
    row_i = ((ok * 13 + ln) % rows_n).cast("int")
    col_i = ((sk * 11 + ok) % cols_n).cast("int")
    xmin = (1 + (F.col("l_partkey") * 37 + ln * 91) % 450).cast("int")
    ymin = (1 + (ok * 53 + sk * 29) % 450).cast("int")
    w = (4 + ok % 60).cast("int")
    h = (4 + sk % 60).cast("int")
    label_idx = (1 + (ok * 7 + ln) % len(LABEL_VARIANTS)).cast("int")
    # mixed-radix unique id over (orderkey, linenumber, partkey, suppkey);
    # fully-duplicate lineitem rows collapse via distinct() below.
    # Radices hold for sf <= 0.1 (partkey < 1e5, suppkey < 1e4, line < 10).
    annot_id = ((ok * 10 + ln) * 100000 + F.col("l_partkey")) * 10000 + sk
    return j.select(
        annot_id.alias("annot_id"),
        F.concat_ws(
            "_",
            F.col("tile_name"),
            F.lpad(row_i.cast("string"), 2, "0"),
            F.lpad(col_i.cast("string"), 2, "0"),
        ).alias("image_name"),
        F.col("tile_name"),
        F.col("tile_key"),
        row_i.alias("row_index"),
        col_i.alias("col_index"),
        F.element_at(
            F.array(*[F.lit(v) for v in LABEL_VARIANTS]), label_idx
        ).alias("raw_label"),
        F.when((ok + ln) % 5 == 0, 1).otherwise(0).cast("int").alias("truncated"),
        F.when((ok + sk) % 7 == 0, 1).otherwise(0).cast("int").alias("difficult"),
        xmin.alias("xmin"),
        ymin.alias("ymin"),
        F.least(xmin + w, F.lit(CHIP)).alias("xmax"),
        F.least(ymin + h, F.lit(CHIP)).alias("ymax"),
    )


def g_annotations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Annotations translated to tile-global pixel + UTM coordinates.

    P7 1->0-index shift (src/form_calcs.py:894-897), P6 chip->tile
    translation with edge clamp (src/form_calcs.py:676-694), P8
    pixel->UTM linspace interpolation (src/form_calcs.py:853-858:
    ``linspace(nw, se, n)[px]`` == ``nw + px*(se-nw)/(n-1)``), P10
    centroid midpoint, P12 diameter = min side * 0.6 m/px
    (src/form_calcs.py:795-809, 919-928).
    """
    a = annotations(spark, sf_dir)
    t = tiles(spark, sf_dir).drop("tile_name")
    j = a.join(t, "tile_key")
    gx = lambda c: F.least(F.col(c) - 1 + F.col("col_index") * CHIP, F.col("tile_width"))
    gy = lambda c: F.least(F.col(c) - 1 + F.col("row_index") * CHIP, F.col("tile_height"))
    j = (
        j.withColumn("gxmin", gx("xmin"))
        .withColumn("gymin", gy("ymin"))
        .withColumn("gxmax", gx("xmax"))
        .withColumn("gymax", gy("ymax"))
    )
    ux = lambda px: F.col("nw_x_utm") + px.cast("double") * (
        F.col("se_x_utm") - F.col("nw_x_utm")
    ) / (F.col("tile_width").cast("double") - 1)
    uy = lambda px: F.col("nw_y_utm") + px.cast("double") * (
        F.col("se_y_utm") - F.col("nw_y_utm")
    ) / (F.col("tile_height").cast("double") - 1)
    j = (
        j.withColumn("utm_minx", ux(F.col("gxmin")))
        .withColumn("utm_maxx", ux(F.col("gxmax")))
        .withColumn("utm_maxy", uy(F.col("gymin")))  # row 0 is the NW (top) edge
        .withColumn("utm_miny", uy(F.col("gymax")))
    )
    return j.select(
        "annot_id", "image_name", "tile_name", "tile_key", "raw_label",
        "truncated", "difficult",
        "gxmin", "gymin", "gxmax", "gymax",
        "utm_projection", "utm_minx", "utm_miny", "utm_maxx", "utm_maxy",
        ((F.col("utm_minx") + F.col("utm_maxx")) / 2).alias("centroid_x"),
        ((F.col("utm_miny") + F.col("utm_maxy")) / 2).alias("centroid_y"),
        (
            F.least(F.col("gxmax") - F.col("gxmin"), F.col("gymax") - F.col("gymin"))
            .cast("double") * RESOLUTION_M
        ).alias("diameter"),
    )


def counties(spark: SparkSession, sf_dir: str) -> DataFrame:
    nk, rk = F.col("n_nationkey"), F.col("n_regionkey")
    cx = nk % 5
    cy = F.floor(nk / 5).cast("int")
    minx = 400000.0 + cx.cast("double") * 25000.0
    miny = 3900000.0 + cy.cast("double") * 21000.0
    return load(spark, sf_dir, "nation").select(
        F.col("n_name").alias("county_name"),
        F.lpad((rk + 1).cast("string"), 2, "0").alias("state_fips"),
        F.lpad((nk + 1).cast("string"), 3, "0").alias("county_fips"),
        minx.alias("c_minx"),
        miny.alias("c_miny"),
        (minx + 26000.0).alias("c_maxx"),
        (miny + 22000.0).alias("c_maxy"),
    )


def _variants_sql() -> str:
    return "[" + ", ".join("'" + v.replace("'", "''") + "'" for v in LABEL_VARIANTS) + "]"


# DuckDB CTE bodies mirroring the builders above, for oracle SQL.
SQL: dict[str, str] = {
    "tiles": f"""
  SELECT 'm_' || (3008600 + p_partkey) || '_' ||
           (['ne','nw','se','sw'])[(p_partkey % 4 + 1)::INT] || '_' ||
           (16 + p_partkey % 2) || '_1_' ||
           ((2018 + p_partkey % 3) * 10000 + (1 + p_partkey % 12) * 100
             + (1 + p_partkey % 28)) AS tile_name,
         (1024 + (p_partkey * 37) % 2000)::INT AS tile_width,
         (1024 + (p_partkey * 53) % 2000)::INT AS tile_height,
         (3 + p_partkey % 2)::INT AS tile_bands,
         'EPSG:269' || (16 + p_partkey % 2) AS utm_projection,
         400000.0 + (p_partkey % 50)::DOUBLE * 2400.0 AS nw_x_utm,
         4000000.0 - ((p_partkey * 7) % 40)::DOUBLE * 2400.0 AS nw_y_utm,
         400000.0 + (p_partkey % 50)::DOUBLE * 2400.0
           + (1024 + (p_partkey * 37) % 2000)::DOUBLE * {RESOLUTION_M} AS se_x_utm,
         4000000.0 - ((p_partkey * 7) % 40)::DOUBLE * 2400.0
           - (1024 + (p_partkey * 53) % 2000)::DOUBLE * {RESOLUTION_M} AS se_y_utm,
         p_partkey AS tile_key
  FROM part
""",
    "images": f"""
  SELECT tile_name || '_' || lpad(row_index::VARCHAR, 2, '0')
                   || '_' || lpad(col_index::VARCHAR, 2, '0') AS image_name,
         tile_name, tile_key, row_index, col_index,
         col_index * {CHIP} AS minx_px,
         row_index * {CHIP} AS miny_px,
         least((col_index + 1) * {CHIP} - 1, tile_width)  AS maxx_px,
         least((row_index + 1) * {CHIP} - 1, tile_height) AS maxy_px
  FROM (
    SELECT *, unnest(generate_series(0, ((tile_width + {CHIP - 1}) // {CHIP} - 1)::INT))::INT AS col_index
    FROM (
      SELECT *, unnest(generate_series(0, ((tile_height + {CHIP - 1}) // {CHIP} - 1)::INT))::INT AS row_index
      FROM tiles
    )
  )
""",
    "annotations": f"""
  SELECT ((l_orderkey * 10 + l_linenumber) * 100000 + l_partkey) * 10000 + l_suppkey
           AS annot_id,
         tile_name || '_' ||
           lpad(((l_orderkey * 13 + l_linenumber) % (((tile_height + {CHIP - 1}) // {CHIP})::INT))::VARCHAR, 2, '0')
           || '_' ||
           lpad(((l_suppkey * 11 + l_orderkey) % (((tile_width + {CHIP - 1}) // {CHIP})::INT))::VARCHAR, 2, '0')
           AS image_name,
         tile_name, tile_key,
         ((l_orderkey * 13 + l_linenumber) % (((tile_height + {CHIP - 1}) // {CHIP})::INT))::INT AS row_index,
         ((l_suppkey * 11 + l_orderkey) % (((tile_width + {CHIP - 1}) // {CHIP})::INT))::INT AS col_index,
         ({_variants_sql()})[(1 + (l_orderkey * 7 + l_linenumber) % {len(LABEL_VARIANTS)})::INT] AS raw_label,
         (CASE WHEN (l_orderkey + l_linenumber) % 5 = 0 THEN 1 ELSE 0 END)::INT AS truncated,
         (CASE WHEN (l_orderkey + l_suppkey) % 7 = 0 THEN 1 ELSE 0 END)::INT AS difficult,
         (1 + (l_partkey * 37 + l_linenumber * 91) % 450)::INT AS xmin,
         (1 + (l_orderkey * 53 + l_suppkey * 29) % 450)::INT AS ymin,
         least((1 + (l_partkey * 37 + l_linenumber * 91) % 450) + 4 + l_orderkey % 60, {CHIP})::INT AS xmax,
         least((1 + (l_orderkey * 53 + l_suppkey * 29) % 450) + 4 + l_suppkey % 60, {CHIP})::INT AS ymax
  FROM (SELECT DISTINCT l_orderkey, l_linenumber, l_partkey, l_suppkey FROM lineitem)
       JOIN tiles ON l_partkey = tile_key
""",
    "gann": f"""
  SELECT annot_id, image_name, a.tile_name, a.tile_key, raw_label,
         truncated, difficult,
         gxmin, gymin, gxmax, gymax,
         utm_projection,
         nw_x_utm + gxmin::DOUBLE * (se_x_utm - nw_x_utm) / (tile_width::DOUBLE - 1)  AS utm_minx,
         nw_y_utm + gymax::DOUBLE * (se_y_utm - nw_y_utm) / (tile_height::DOUBLE - 1) AS utm_miny,
         nw_x_utm + gxmax::DOUBLE * (se_x_utm - nw_x_utm) / (tile_width::DOUBLE - 1)  AS utm_maxx,
         nw_y_utm + gymin::DOUBLE * (se_y_utm - nw_y_utm) / (tile_height::DOUBLE - 1) AS utm_maxy,
         ((nw_x_utm + gxmin::DOUBLE * (se_x_utm - nw_x_utm) / (tile_width::DOUBLE - 1))
          + (nw_x_utm + gxmax::DOUBLE * (se_x_utm - nw_x_utm) / (tile_width::DOUBLE - 1))) / 2 AS centroid_x,
         ((nw_y_utm + gymax::DOUBLE * (se_y_utm - nw_y_utm) / (tile_height::DOUBLE - 1))
          + (nw_y_utm + gymin::DOUBLE * (se_y_utm - nw_y_utm) / (tile_height::DOUBLE - 1))) / 2 AS centroid_y,
         least(gxmax - gxmin, gymax - gymin)::DOUBLE * {RESOLUTION_M} AS diameter
  FROM (
    SELECT a.*, t.tile_width, t.tile_height, t.utm_projection,
           t.nw_x_utm, t.nw_y_utm, t.se_x_utm, t.se_y_utm,
           least(a.xmin - 1 + a.col_index * {CHIP}, t.tile_width)  AS gxmin,
           least(a.ymin - 1 + a.row_index * {CHIP}, t.tile_height) AS gymin,
           least(a.xmax - 1 + a.col_index * {CHIP}, t.tile_width)  AS gxmax,
           least(a.ymax - 1 + a.row_index * {CHIP}, t.tile_height) AS gymax
    FROM annotations a JOIN tiles t ON a.tile_key = t.tile_key
  ) a
""",
    "counties": """
  SELECT n_name AS county_name,
         lpad((n_regionkey + 1)::VARCHAR, 2, '0') AS state_fips,
         lpad((n_nationkey + 1)::VARCHAR, 3, '0') AS county_fips,
         400000.0 + (n_nationkey % 5)::DOUBLE * 25000.0 AS c_minx,
         3900000.0 + (n_nationkey // 5)::DOUBLE * 21000.0 AS c_miny,
         400000.0 + (n_nationkey % 5)::DOUBLE * 25000.0 + 26000.0 AS c_maxx,
         3900000.0 + (n_nationkey // 5)::DOUBLE * 21000.0 + 22000.0 AS c_maxy
  FROM nation
""",
}

_ORDER = ["tiles", "images", "annotations", "gann", "counties"]
_DEPS = {"images": ["tiles"], "annotations": ["tiles"], "gann": ["tiles", "annotations"]}


def domain_ctes(*needed: str) -> str:
    """CTE list text (no WITH keyword): ``tiles AS (...), gann AS (...)``."""
    deps: list[str] = []

    def add(n: str) -> None:
        for d in _DEPS.get(n, []):
            add(d)
        if n not in deps:
            deps.append(n)

    for n in needed:
        add(n)
    deps.sort(key=_ORDER.index)
    return ",\n".join(f"{n} AS ({SQL[n]})" for n in deps)


def with_domain(body: str, *needed: str) -> str:
    """Compose a DuckDB query: WITH tiles AS (...), ... <body>."""
    return f"WITH {domain_ctes(*needed)}\n{body}"


# ---------------------------------------------------------------------------
# Per-session view memoization.
#
# A correctness sweep runs ~25 domain queries back-to-back in one
# SparkSession; without caching, each re-derives annotations (a
# distinct + join over lineitem) and gann (another join + the UTM
# arithmetic) from parquet. Memoizing the DataFrame per
# (application, sf_dir) and marking it .cache() (MEMORY_AND_DISK)
# makes every query after the first read the already-computed columnar
# cache — the whole 119-query sweep then fits the driver's time budget.
#
# Scale note: this is a SESSION-sweep optimization, sized for the
# derived views (sf0.1 gann ≈ 600k rows ≈ tens of MB, spills to disk
# past memory). On a 100 TB cluster the same role is played by
# materializing the views once as bucketed parquet (SCALING.md) — not
# by executor-memory caching of a fact-scale table. Disable with
# SPARK_GRAFT_CACHE_VIEWS=0 to benchmark the uncached path.
# ---------------------------------------------------------------------------

# key -> (cached marked handle for unpersist, consumer-facing frame)
_VIEW_CACHE: dict[tuple[str, str, str], tuple[DataFrame, DataFrame]] = {}


def clear_view_cache() -> None:
    for marked, _ in _VIEW_CACHE.values():
        try:
            marked.unpersist()
        except Exception:
            pass  # session already stopped
    _VIEW_CACHE.clear()


def _memo(name: str, fn):
    def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
        # Highest precedence: a materialized warehouse (bucketed
        # parquet via sources/materialize) — the cluster-scale input
        # shape. Applies even inside uncached_views(): bucketed table
        # scans ARE the fully-optimizable lineage (bucket-pruned joins,
        # no InMemoryRelation barrier).
        prefix = getattr(_MATERIALIZED, "prefix", None)
        if prefix is not None and spark.catalog.tableExists(f"{prefix}{name}"):
            return spark.table(f"{prefix}{name}")
        if getattr(_BYPASS, "on", False) or (
            os.environ.get("SPARK_GRAFT_CACHE_VIEWS", "1") == "0"
        ):
            return fn(spark, sf_dir)
        app = spark.sparkContext.applicationId
        # Self-maintaining eviction: entries keyed by a stopped
        # session's applicationId can never be reused — drop them
        # instead of accumulating for the life of the process (r3
        # ADVICE). Their RDD blocks died with the old session, so no
        # unpersist is needed (or possible).
        for k in [k for k in _VIEW_CACHE if k[0] != app]:
            del _VIEW_CACHE[k]
        key = (app, sf_dir, name)
        hit = _VIEW_CACHE.get(key)
        if hit is None:
            # Cache a marker-projected variant, not the raw plan:
            # Spark's CacheManager substitutes ANY analyzed subtree
            # that matches a cached plan with the InMemoryRelation, so
            # caching fn's exact output would silently rewrite even
            # uncached_views() lineage (the flagship's). The marker
            # column makes the cached plan match nothing but itself;
            # memoized callers still read the cache through the drop()
            # projection below.
            marked = fn(spark, sf_dir).withColumn("__view_cache_marker", F.lit(1)).cache()
            hit = (marked, marked.drop("__view_cache_marker"))
            _VIEW_CACHE[key] = hit
        return hit[1]

    wrapper.__name__ = fn.__name__
    wrapper.__doc__ = fn.__doc__
    return wrapper


# An InMemoryRelation is an optimization barrier: scan-partitioned, no
# pushdown or exchange-sharing through it. Consumers that want the
# fully-collapsible lineage — the flagship derives the views inline so
# Catalyst can share exchanges and push partial aggregation across the
# view boundary (the 4-exchange shape pinned by
# tests/test_scale_knobs.py) — opt out with ``uncached_views()``; the
# flag is honored by every nested builder call, so the whole dependency
# chain stays raw.
_BYPASS = threading.local()


@contextmanager
def uncached_views():
    """Build domain views with raw (uncached) lineage inside this block."""
    prev = getattr(_BYPASS, "on", False)
    _BYPASS.on = True
    try:
        yield
    finally:
        _BYPASS.on = prev


# Materialized-warehouse mode: view builders resolve to the bucketed
# tables written by sources/materialize.materialize_domain_views —
# the 100 TB input shape, where the derivation ran once and every
# consumer (including the flagship) reads bucket-pruned parquet.
# Views without a table under the prefix (e.g. counties, a
# broadcast-size dim) fall through to their builders.
_MATERIALIZED = threading.local()


@contextmanager
def materialized_views(prefix: str = "mat_"):
    """Resolve domain views from materialized bucketed tables inside
    this block (tables written by ``materialize_domain_views``)."""
    prev = getattr(_MATERIALIZED, "prefix", None)
    _MATERIALIZED.prefix = prefix
    try:
        yield
    finally:
        _MATERIALIZED.prefix = prev


# Rebinding the module-level names routes internal callers (annotations
# -> tiles, g_annotations -> annotations) through the cache too, so the
# dependency chain materializes each stage exactly once per session.
tiles = _memo("tiles", tiles)
images = _memo("images", images)
annotations = _memo("annotations", annotations)
g_annotations = _memo("gann", g_annotations)
counties = _memo("counties", counties)

BUILDERS = {
    "tiles": tiles,
    "images": images,
    "annotations": annotations,
    "gann": g_annotations,
    "counties": counties,
}
