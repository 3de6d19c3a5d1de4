"""A1 — per-tile bounding-box merge as connected components
(SURVEY.md §2.5 A1; ref: src/form_calcs.py:753-792 merge_algo +
driver 812-985).

The reference runs a greedy single pass with in-loop deletes, which is
order-dependent and not a fixpoint. Per SURVEY §7 the engine computes
the deterministic fixpoint instead: connected components over the P14
adjacency graph (J7 edges), then one aggregate per component — a
superset of every greedy result and idempotent (property-tested).

Class conflicts inside a component yield ``undefined_object`` — the
reference *intends* this (src/form_calcs.py:782-783) but immediately
overwrites it with the first box's class (latent bug, :784); we
implement the intended rule.

Execution shape: ``groupBy(tile_name).applyInPandas`` — one shuffle on
tile_name; components are tiny (objects per tile), so the O(n^2)
adjacency test is per-group local work. At 100 TB this scales linearly
with tiles across executors. A mega-tile (one tile with far more
candidates than its peers) gets no automatic AQE skew split inside a
grouped map, so past SPLIT_THRESHOLD the operator switches to
``_components_gridded``: PBSM grid cells bound the per-chunk adjacency
matrix and one union-find stitches components across cell borders —
same fixpoint, memory linear in cell occupancy instead of quadratic in
tile size. Only a genuinely dense single-cell clique still errors
(MAX_GROUP).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MERGE_SCHEMA = (
    "tile_key long, tile_name string, component_id long, object_class string, "
    "image_names array<string>, gxmin int, gymin int, gxmax int, gymax int, "
    "n_members long, merged_bbox boolean"
)

MAX_GROUP = 100_000  # defensive bound for one grid cell's candidate count
# Above this many candidates in one tile, the O(n^2) full adjacency
# matrix (n^2 bytes) is replaced by the grid-partitioned edge build
# (_components_gridded): same components, memory bounded per cell.
SPLIT_THRESHOLD = 4096
GRID_CELL_PX = 1024


def _adjacency_matrix(b: np.ndarray, dist_limit: int) -> np.ndarray:
    """Vectorized P14 over all pairs: b is (n,4) [xmin,ymin,xmax,ymax]."""
    x0, y0, x1, y1 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    # pairwise, a = rows (i), b = cols (j)
    x_dist = np.minimum(
        np.abs(x0[None, :] - x1[:, None]), np.abs(x1[None, :] - x0[:, None])
    )
    y_dist = np.minimum(
        np.abs(y0[None, :] - y1[:, None]), np.abs(y1[None, :] - y0[:, None])
    )
    a_in_b = (
        (x0[None, :] <= x0[:, None]) & (y0[None, :] <= y0[:, None])
        & (x1[None, :] >= x1[:, None]) & (y1[None, :] >= y1[:, None])
    )
    b_in_a = a_in_b.T
    x_close_a_covers = (x_dist <= dist_limit) & (
        (y0[:, None] <= y0[None, :]) & (y1[:, None] >= y1[None, :])
    )
    y_close_a_covers = (y_dist <= dist_limit) & (
        (x0[:, None] <= x0[None, :]) & (x1[:, None] >= x1[None, :])
    )
    adj = (
        a_in_b | b_in_a
        | x_close_a_covers | x_close_a_covers.T
        | y_close_a_covers | y_close_a_covers.T
    )
    np.fill_diagonal(adj, False)
    return adj


def _components(adj: np.ndarray) -> np.ndarray:
    """Union-find over a boolean adjacency matrix -> root label per node."""
    n = adj.shape[0]
    parent = np.arange(n)

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    rows, cols = np.nonzero(adj)
    for i, j in zip(rows.tolist(), cols.tolist()):
        if i < j:
            ri, rj = find(i), find(j)
            if ri != rj:
                parent[max(ri, rj)] = min(ri, rj)
    return np.array([find(i) for i in range(n)])


def _components_gridded(
    b: np.ndarray, dist_limit: int, cell: int = GRID_CELL_PX
) -> np.ndarray:
    """Mega-tile fallback: same components as
    ``_components(_adjacency_matrix(b))`` without the O(n^2) matrix.

    PBSM-style (like operators/spatial.grid_cell_intersect_join, the
    J8 non-broadcast path): every P14-adjacent pair either intersects
    (containment arm) or sits within ``dist_limit`` on one axis and
    overlaps on the other (closeness arms), so the two boxes' bboxes
    expanded by ``dist_limit`` always intersect — meaning the pair
    co-occurs in at least one grid cell when each box registers in
    every cell its expanded bbox overlaps. Adjacency then runs per
    cell (bounded memory), and a single union-find over the union of
    per-cell edges stitches components across cell borders.

    A cell that still exceeds MAX_GROUP is a genuine ~dense clique in
    one 1024-px neighborhood — that is an input pathology, not a
    partitioning failure, and raises as before.
    """
    n = len(b)
    cx0 = (b[:, 0] - dist_limit) // cell
    cx1 = (b[:, 2] + dist_limit) // cell
    cy0 = (b[:, 1] - dist_limit) // cell
    cy1 = (b[:, 3] + dist_limit) // cell

    cells: dict[tuple[int, int], list[int]] = {}
    for i in range(n):
        for gx in range(int(cx0[i]), int(cx1[i]) + 1):
            for gy in range(int(cy0[i]), int(cy1[i]) + 1):
                cells.setdefault((gx, gy), []).append(i)

    parent = np.arange(n)

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for members in cells.values():
        m = len(members)
        if m < 2:
            continue
        if m > MAX_GROUP:
            raise ValueError(
                f"grid cell holds {m} merge candidates (> {MAX_GROUP}); "
                "input is a dense clique — pre-aggregate this tile"
            )
        idx = np.asarray(members)
        adj = _adjacency_matrix(b[idx], dist_limit)
        rows, cols = np.nonzero(adj)
        for a, c in zip(idx[rows].tolist(), idx[cols].tolist()):
            if a < c:
                ra, rc = find(a), find(c)
                if ra != rc:
                    parent[max(ra, rc)] = min(ra, rc)
    return np.array([find(i) for i in range(n)])


_OUT_COLS = (
    "tile_key", "tile_name", "component_id", "object_class", "image_names",
    "gxmin", "gymin", "gxmax", "gymax", "n_members", "merged_bbox",
)


def _merge_partition(batches, dist_limit: int):
    """mapInPandas body: all tiles hash-assigned to this partition.

    One Python/Arrow round trip per partition (not per tile) — the
    per-tile work is a numpy adjacency + union-find over n_tile boxes.
    Memory bound: one shuffle partition of candidate rows.

    Output is assembled in two paths: singleton components (the vast
    majority — a candidate box that touches nothing merges with
    nothing) are emitted as vectorized column copies, and only genuine
    multi-member components walk the per-component aggregation loop.
    Without the split, the loop's ~10 small numpy/set ops per component
    ran once per *input row* and dominated the stage's wall-clock.
    """
    pdfs = [p for p in batches if len(p)]
    if not pdfs:
        return
    pdf = pd.concat(pdfs, ignore_index=True)
    pdf = pdf.sort_values(["tile_key", "annot_id"], kind="mergesort").reset_index(drop=True)
    tk = pdf["tile_key"].to_numpy()
    bounds = np.flatnonzero(np.r_[True, tk[1:] != tk[:-1], True])
    boxes_all = pdf[["gxmin", "gymin", "gxmax", "gymax"]].to_numpy(np.int64)
    ids = pdf["annot_id"].to_numpy()
    names = pdf["image_name"].to_numpy()
    classes = pdf["object_class"].to_numpy()
    tnames = pdf["tile_name"].to_numpy()

    # Component labels, globally unique across tiles: local root index
    # offset by the tile's slice start.
    comp_global = np.empty(len(pdf), dtype=np.int64)
    for s, e in zip(bounds[:-1], bounds[1:]):
        n = e - s
        if n == 1:
            comp_global[s] = s
            continue
        if n > SPLIT_THRESHOLD:
            # mega-tile: grid-partitioned edge build, bounded memory
            comp = _components_gridded(boxes_all[s:e], dist_limit)
        else:
            comp = _components(_adjacency_matrix(boxes_all[s:e], dist_limit))
        comp_global[s:e] = s + comp

    _, inverse, counts = np.unique(comp_global, return_inverse=True, return_counts=True)
    single = counts[inverse] == 1

    frames = []
    if single.any():
        frames.append(pd.DataFrame({
            "tile_key": tk[single],
            "tile_name": tnames[single],
            "component_id": ids[single],
            "object_class": classes[single],
            "image_names": [[nm] for nm in names[single]],
            "gxmin": boxes_all[single, 0],
            "gymin": boxes_all[single, 1],
            "gxmax": boxes_all[single, 2],
            "gymax": boxes_all[single, 3],
            "n_members": np.ones(int(single.sum()), dtype=np.int64),
            "merged_bbox": np.zeros(int(single.sum()), dtype=bool),
        }))

    multi_idx = np.flatnonzero(~single)
    if len(multi_idx):
        multi_idx = multi_idx[np.argsort(comp_global[multi_idx], kind="stable")]
        cg = comp_global[multi_idx]
        cbounds = np.flatnonzero(np.r_[True, cg[1:] != cg[:-1], True])
        out: dict[str, list] = {c: [] for c in _OUT_COLS}
        for s, e in zip(cbounds[:-1], cbounds[1:]):
            m = multi_idx[s:e]
            cls = set(classes[m])
            out["tile_key"].append(int(tk[m[0]]))
            out["tile_name"].append(tnames[m[0]])
            out["component_id"].append(int(ids[m].min()))
            out["object_class"].append(cls.pop() if len(cls) == 1 else "undefined_object")
            out["image_names"].append(sorted(set(names[m])))
            out["gxmin"].append(int(boxes_all[m, 0].min()))
            out["gymin"].append(int(boxes_all[m, 1].min()))
            out["gxmax"].append(int(boxes_all[m, 2].max()))
            out["gymax"].append(int(boxes_all[m, 3].max()))
            out["n_members"].append(int(len(m)))
            out["merged_bbox"].append(bool(len(m) > 1))
        frames.append(pd.DataFrame(out))

    res = pd.concat(frames, ignore_index=True)
    # Deterministic per-partition order regardless of which path
    # emitted a row (stable output files; positional test compares).
    yield res.sort_values(["tile_key", "component_id"], kind="mergesort", ignore_index=True)


def merge_tile_annotations(gann: DataFrame, dist_limit: int = 5) -> DataFrame:
    """Merge trunc/difficult candidate boxes per tile (A1); pass clean
    boxes through unmerged (F5 partition).

    Physical shape: two pushed-filter scans of the source (candidates /
    clean) — only the candidate subset shuffles (repartition on
    tile_key); the clean majority streams through narrow ops. Cheaper
    at scale than one scan + shuffling every row through the grouped map.

    Input needs: annot_id, tile_key, tile_name, image_name,
    object_class, truncated, difficult, gxmin/gymin/gxmax/gymax.
    """
    is_candidate = (F.col("truncated") == 1) | (F.col("difficult") == 1)
    base = gann.select(
        "annot_id", "tile_key", "tile_name", "image_name", "object_class",
        "truncated", "difficult", "gxmin", "gymin", "gxmax", "gymax",
    )
    cand = base.filter(is_candidate)
    clean = base.filter(~is_candidate)

    # Explicit partition count: bare repartition(col) lets AQE coalesce
    # by shuffle bytes, which serializes the CPU-bound per-tile merge
    # onto one task when candidate rows are few-but-expensive.
    n_part = int(cand.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    merged = cand.repartition(n_part, "tile_key").mapInPandas(
        lambda it: _merge_partition(it, dist_limit), schema=MERGE_SCHEMA
    )
    passthrough = clean.select(
        "tile_key",
        "tile_name",
        F.col("annot_id").alias("component_id"),
        "object_class",
        F.array("image_name").alias("image_names"),
        "gxmin", "gymin", "gxmax", "gymax",
        F.lit(1).cast("long").alias("n_members"),
        F.lit(False).alias("merged_bbox"),
    )
    return merged.unionByName(passthrough)


# DuckDB oracle for the merge: recursive-CTE connected components over
# the same P14 edges, aggregated identically. ``cand_sql`` must select
# annot_id, tile_key, tile_name, image_name, object_class,
# gxmin/gymin/gxmax/gymax. ``merge_oracle_ctes`` returns the CTE list
# (ending with ``merged_all``) so callers can extend the same
# WITH RECURSIVE scope; ``merge_oracle_sql`` is the standalone query.
def merge_oracle_ctes(cand_sql: str, clean_sql: str, adjacency_sql: str) -> str:
    return f"""
cand AS ({cand_sql}),
edges(src, dst) AS (
  SELECT a.annot_id, b.annot_id
  FROM cand a JOIN cand b
    ON a.tile_key = b.tile_key AND a.annot_id <> b.annot_id
  WHERE {adjacency_sql}
),
cc(id, comp) AS (
  SELECT annot_id, annot_id FROM cand
  UNION
  SELECT e.dst, cc.comp FROM cc JOIN edges e ON cc.id = e.src WHERE cc.comp < e.dst
),
lbl AS (SELECT id, min(comp) AS comp FROM cc GROUP BY id),
merged AS (
  SELECT c.tile_key AS tile_key,
         min(c.tile_name) AS tile_name,
         min(c.annot_id)::BIGINT AS component_id,
         (CASE WHEN count(DISTINCT c.object_class) = 1 THEN min(c.object_class)
               ELSE 'undefined_object' END) AS object_class,
         list_sort(list(DISTINCT c.image_name)) AS image_names,
         min(c.gxmin)::INT AS gxmin, min(c.gymin)::INT AS gymin,
         max(c.gxmax)::INT AS gxmax, max(c.gymax)::INT AS gymax,
         count(*)::BIGINT AS n_members,
         (count(*) > 1) AS merged_bbox
  FROM cand c JOIN lbl ON c.annot_id = lbl.id
  GROUP BY c.tile_key, lbl.comp
),
clean AS ({clean_sql}),
merged_all AS (
  SELECT * FROM merged
  UNION ALL
  SELECT tile_key, tile_name, annot_id::BIGINT AS component_id, object_class,
         [image_name] AS image_names,
         gxmin::INT, gymin::INT, gxmax::INT, gymax::INT,
         1::BIGINT AS n_members, false AS merged_bbox
  FROM clean
)
"""


def merge_oracle_sql(
    cand_sql: str, clean_sql: str, adjacency_sql: str, extra_ctes: str = ""
) -> str:
    prefix = f"{extra_ctes}," if extra_ctes else ""
    return (
        "WITH RECURSIVE\n"
        + prefix
        + merge_oracle_ctes(cand_sql, clean_sql, adjacency_sql)
        + "\nSELECT * FROM merged_all"
    )
