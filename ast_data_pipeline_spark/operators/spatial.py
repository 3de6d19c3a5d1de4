"""Spatial join operators (SURVEY.md §2.4 J6/J7/J8, §2.2 P13/P14).

All reference geometry is axis-aligned rectangles (SURVEY §1.2), so
the engine represents geometry as bbox columns and implements the
spatial joins as range-predicate joins — no geometry library needed.
The small polygon side (counties: ~3.2k rows in the reference) is
broadcast, so the fact side never shuffles (ref's versions are
O(n*m) Python loops: src/az_proc.py:161-191, src/form_calcs.py:
992-1037, 753-760).

At 100 TB the county/tile dimension stays broadcastable (counties
~3.2k, NAIP tiles ~220k rows of plain floats); if the polygon side
ever outgrew broadcast, the standard upgrade is a grid-cell
(space-partitioned) equi-join on cell id + refine, which composes
from the same predicates below.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def adjacency_predicate(a: str, b: str, dist_limit: int) -> Column:
    """P14 (ref: src/form_calcs.py:716-750 calc_sim): true iff one bbox
    contains the other, or they are within ``dist_limit`` in one axis
    and fully covered in the other axis.

    ``a``/``b`` are DataFrame aliases with gxmin/gymin/gxmax/gymax.
    """
    ax0, ay0, ax1, ay1 = (F.col(f"{a}.g{c}") for c in ("xmin", "ymin", "xmax", "ymax"))
    bx0, by0, bx1, by1 = (F.col(f"{b}.g{c}") for c in ("xmin", "ymin", "xmax", "ymax"))
    x_dist = F.least(F.abs(bx0 - ax1), F.abs(bx1 - ax0))
    y_dist = F.least(F.abs(by0 - ay1), F.abs(by1 - ay0))
    a_in_b = (bx0 <= ax0) & (by0 <= ay0) & (bx1 >= ax1) & (by1 >= ay1)
    b_in_a = (ax0 <= bx0) & (ay0 <= by0) & (ax1 >= bx1) & (ay1 >= by1)
    x_close_a_covers = (x_dist <= dist_limit) & (ay0 <= by0) & (ay1 >= by1)
    x_close_b_covers = (x_dist <= dist_limit) & (by0 <= ay0) & (by1 >= ay1)
    y_close_a_covers = (y_dist <= dist_limit) & (ax0 <= bx0) & (ax1 >= bx1)
    y_close_b_covers = (y_dist <= dist_limit) & (bx0 <= ax0) & (bx1 >= ax1)
    return (
        a_in_b | b_in_a
        | x_close_a_covers | x_close_b_covers
        | y_close_a_covers | y_close_b_covers
    )


def adjacency_predicate_sql(a: str, b: str, dist_limit: int) -> str:
    """DuckDB oracle text for ``adjacency_predicate``."""
    return f"""(
    ({b}.gxmin <= {a}.gxmin AND {b}.gymin <= {a}.gymin
      AND {b}.gxmax >= {a}.gxmax AND {b}.gymax >= {a}.gymax)
 OR ({a}.gxmin <= {b}.gxmin AND {a}.gymin <= {b}.gymin
      AND {a}.gxmax >= {b}.gxmax AND {a}.gymax >= {b}.gymax)
 OR (least(abs({b}.gxmin - {a}.gxmax), abs({b}.gxmax - {a}.gxmin)) <= {dist_limit}
      AND {a}.gymin <= {b}.gymin AND {a}.gymax >= {b}.gymax)
 OR (least(abs({b}.gxmin - {a}.gxmax), abs({b}.gxmax - {a}.gxmin)) <= {dist_limit}
      AND {b}.gymin <= {a}.gymin AND {b}.gymax >= {a}.gymax)
 OR (least(abs({b}.gymin - {a}.gymax), abs({b}.gymax - {a}.gymin)) <= {dist_limit}
      AND {a}.gxmin <= {b}.gxmin AND {a}.gxmax >= {b}.gxmax)
 OR (least(abs({b}.gymin - {a}.gymax), abs({b}.gymax - {a}.gymin)) <= {dist_limit}
      AND {b}.gxmin <= {a}.gxmin AND {b}.gxmax >= {a}.gxmax)
)"""


def assign_county_argmax(
    tanks: DataFrame,
    counties_df: DataFrame,
    payload_cols: list[str] | None = None,
    extra_group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """J8 (ref: src/form_calcs.py:992-1037): tank bbox x county polygon
    intersect join; on multi-county overlap keep the county with max
    intersection-area / tank-area. Counties broadcast; argmax via
    row_number over (tank, overlap desc).

    Expects tanks with utm_minx/miny/maxx/maxy and a unique key column
    ``annot_id``; counties with c_minx/c_miny/c_maxx/c_maxy + fips.

    ``payload_cols``: optional narrowed list of tank columns to carry
    through the argmax — the max_by payload is this operator's ONLY
    fact-width shuffle, so callers that need just a column or two cut
    shuffle bytes proportionally (the r6 shuffle audit measured
    d_distribution_by_county at 30.7 MB/sf0.1 with the default
    full-row payload — utm doubles, annot_id, overlap_frac and
    county_name all riding along for a query that keeps only
    object_class + fips). Default keeps the original full-row
    behavior; narrowed mode returns annot_id (the group key) +
    payload_cols + the county fields.

    ``extra_group_cols`` (r14): columns prepended to the argmax group
    key. annot_id is row-unique, so adding columns it functionally
    determines (its tile_key) cannot change the groups or the output —
    but it lets the aggregation's ClusteredDistribution be satisfied
    by an existing HashPartitioning on those columns: callers reading
    the tile_key-bucketed gann table pass ("tile_key",) and the argmax
    EXCHANGE DISAPPEARS (guide §2.4 "two operations keyed the same way
    can share one exchange" — here the bucketed layout is the first
    key). Raw-lineage callers simply keep the one exchange they had.
    """
    t, c = tanks.alias("t"), F.broadcast(counties_df).alias("c")
    inter_w = F.least(F.col("t.utm_maxx"), F.col("c.c_maxx")) - F.greatest(
        F.col("t.utm_minx"), F.col("c.c_minx")
    )
    inter_h = F.least(F.col("t.utm_maxy"), F.col("c.c_maxy")) - F.greatest(
        F.col("t.utm_miny"), F.col("c.c_miny")
    )
    tank_area = (F.col("t.utm_maxx") - F.col("t.utm_minx")) * (
        F.col("t.utm_maxy") - F.col("t.utm_miny")
    )
    joined = t.join(c, (inter_w > 0) & (inter_h > 0)).withColumn(
        "overlap_frac", inter_w * inter_h / tank_area
    )
    # argmax via max_by hash aggregate (no per-key sort window): max
    # overlap_frac, ties -> smallest county_id, matching the oracle's
    # row_number(ORDER BY frac DESC, county_id) exactly.
    county_num = F.concat(F.col("c.state_fips"), F.col("c.county_fips")).cast("int")
    # single pass, grouped on the narrow unique key only: hashing the
    # full tank row (wide strings/arrays) as the group key cost ~3x the
    # whole join at sf0.1, so the tank columns ride inside the max_by
    # payload instead — the buffer copies them only on a new max, ~1.07
    # candidate rows per tank.
    keep = tanks.columns if payload_cols is None else list(payload_cols)
    fields = [F.col(f"t.{name}").alias(name) for name in keep] + [
        F.col("c.state_fips").alias("state_fips"),
        F.col("c.county_fips").alias("county_fips"),
    ]
    if payload_cols is None:
        # full-row mode also carries the display name + the winning
        # fraction (narrowed mode keeps the fips pair only)
        fields.insert(len(keep), F.col("c.county_name").alias("county_name"))
        fields.append(F.col("overlap_frac").alias("overlap_frac"))
    gcols = [F.col(f"t.{c}") for c in extra_group_cols] + [F.col("t.annot_id")]
    best = joined.groupBy(*gcols).agg(
        F.max_by(F.struct(*fields), F.struct(F.col("overlap_frac"), -county_num)).alias("r")
    )
    if payload_cols is None:
        return best.select("r.*")
    return best.select("annot_id", "r.*")


ARGMAX_COUNTY_SQL_BODY = """
  SELECT *, row_number() OVER (
           PARTITION BY annot_id
           ORDER BY overlap_frac DESC, state_fips || county_fips) AS rn
  FROM (
    SELECT t.*, c.county_name, c.state_fips, c.county_fips,
           (least(t.utm_maxx, c.c_maxx) - greatest(t.utm_minx, c.c_minx))
           * (least(t.utm_maxy, c.c_maxy) - greatest(t.utm_miny, c.c_miny))
           / ((t.utm_maxx - t.utm_minx) * (t.utm_maxy - t.utm_miny)) AS overlap_frac
    FROM gann t JOIN counties c
      ON least(t.utm_maxx, c.c_maxx) > greatest(t.utm_minx, c.c_minx)
     AND least(t.utm_maxy, c.c_maxy) > greatest(t.utm_miny, c.c_miny)
  )
"""


def grid_cell_intersect_join(
    a: DataFrame,
    b: DataFrame,
    a_box: tuple[str, str, str, str],
    b_box: tuple[str, str, str, str],
    cell: float,
) -> DataFrame:
    """Rectangle-intersect join WITHOUT broadcasting either side — the
    scale path for when the polygon side outgrows a broadcast (the
    module docstring's promised upgrade).

    PBSM-style grid partitioning: both sides explode into the grid
    cells their bbox covers, an equi-join on (cx, cy) shuffles matched
    cells together, an exact intersect predicate refines, and the
    *reference-point rule* keeps each pair only in the cell containing
    the intersection's min corner — duplicate elimination without a
    ``distinct`` shuffle.  Cost: one hash shuffle of each side sized by
    its cell fan-out (pick ``cell`` near the median rectangle size).

    Returns all columns of ``a`` then ``b`` for strictly-overlapping
    pairs (zero-area touches excluded, matching J8's ``inter_w > 0``).
    """

    def cells(box: tuple[str, str, str, str]) -> Column:
        minx, miny, maxx, maxy = box
        return F.explode(
            F.expr(
                f"flatten(transform(sequence(floor({minx} / {cell}), floor({maxx} / {cell})), "
                f"cx -> transform(sequence(floor({miny} / {cell}), floor({maxy} / {cell})), "
                f"cy -> struct(cx, cy))))"
            )
        )

    ea = a.withColumn("__cell", cells(a_box)).select(
        "*", F.col("__cell.cx").alias("__cx"), F.col("__cell.cy").alias("__cy")
    ).drop("__cell")
    eb = b.withColumn("__cell", cells(b_box)).select(
        "*", F.col("__cell.cx").alias("__bcx"), F.col("__cell.cy").alias("__bcy")
    ).drop("__cell")

    aminx, aminy, amaxx, amaxy = (F.col(c) for c in a_box)
    bminx, bminy, bmaxx, bmaxy = (F.col(c) for c in b_box)
    inter_minx = F.greatest(aminx, bminx)
    inter_miny = F.greatest(aminy, bminy)
    overlap = (F.least(amaxx, bmaxx) > inter_minx) & (
        F.least(amaxy, bmaxy) > inter_miny
    )
    ref_point_here = (F.floor(inter_minx / cell) == F.col("__cx")) & (
        F.floor(inter_miny / cell) == F.col("__cy")
    )
    return (
        ea.join(
            eb,
            (F.col("__cx") == F.col("__bcx")) & (F.col("__cy") == F.col("__bcy")),
        )
        .where(overlap & ref_point_here)
        .drop("__cx", "__cy", "__bcx", "__bcy")
    )


# Morton (Z-order) layout key — the data-layout tool for spatial
# locality at scale: sorting/range-partitioning a 100 TB inventory by
# this key clusters spatially-near rows into the same parquet files,
# so a bbox query prunes to O(touched cells) files via min/max file
# skipping instead of scanning the world. Pure bit arithmetic
# (portable: the oracle mirrors it literally), 16 bits per axis.

_SPREAD_MASKS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def morton_key(cx: Column, cy: Column) -> Column:
    """Interleave the low 16 bits of two non-negative cell coords into
    a 32-bit Z-order key (x in even bits, y in odd). Columns must be
    integral and < 2^16."""

    def spread(v: Column) -> Column:
        v = v.cast("long")
        for shift, mask in _SPREAD_MASKS:
            v = v.bitwiseOR(F.shiftleft(v, shift)).bitwiseAND(F.lit(mask))
        return v

    return spread(cx).bitwiseOR(F.shiftleft(spread(cy), 1))


def morton_key_sql(cx: str, cy: str) -> str:
    """DuckDB oracle text mirroring :func:`morton_key` bit-for-bit."""

    def spread(v: str) -> str:
        for shift, mask in _SPREAD_MASKS:
            v = f"((({v}) | (({v}) << {shift})) & {mask})"
        return v

    return f"({spread(f'({cx})::BIGINT')} | ({spread(f'({cy})::BIGINT')} << 1))"


def hilbert_xy2d(order: int, x: int, y: int) -> int:
    """Hilbert curve index of cell (x, y) on a 2^order x 2^order grid
    (the public Wikipedia/Hamilton iterative algorithm: quadrant bits
    + rotation). Used to PRECOMPUTE a lookup table small enough to
    ship verbatim into both engines' SQL (order 4 -> 256 entries) —
    the sequential per-bit rotation state does not fold into a SQL
    expression the way Morton's independent bit-spreads do."""
    rx = ry = 0
    d = 0
    s = 1 << (order - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def hilbert_table(order: int) -> list[int]:
    """H[x * 2^order + y] = hilbert index; 2^(2*order) entries."""
    n = 1 << order
    return [hilbert_xy2d(order, x, y) for x in range(n) for y in range(n)]
