"""Property tests for the A1 merge (SURVEY §5.3): guarantees the
reference's greedy algorithm does NOT have, established for ours.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ast_data_pipeline_spark.operators.merge import (
    _adjacency_matrix,
    _components,
    _merge_partition,
)

DIST = 5


def _boxes(draw_n, seed):
    rng = np.random.RandomState(seed)
    x0 = rng.randint(0, 500, draw_n)
    y0 = rng.randint(0, 500, draw_n)
    w = rng.randint(1, 60, draw_n)
    h = rng.randint(1, 60, draw_n)
    return np.stack([x0, y0, x0 + w, y0 + h], axis=1).astype(np.int64)


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 10_000), st.integers(1, 60))
def test_components_are_fixpoint(seed, n):
    b = _boxes(n, seed)
    comp = _components(_adjacency_matrix(b, DIST))
    # merge each component to its union bbox, then re-run: no further merges
    merged = []
    for c in np.unique(comp):
        m = b[comp == c]
        merged.append([m[:, 0].min(), m[:, 1].min(), m[:, 2].max(), m[:, 3].max()])
    merged = np.array(merged, dtype=np.int64)
    # every member is contained in its component bbox
    for i, c in enumerate(np.unique(comp)):
        m = b[comp == c]
        u = merged[i]
        assert (m[:, 0] >= u[0]).all() and (m[:, 1] >= u[1]).all()
        assert (m[:, 2] <= u[2]).all() and (m[:, 3] <= u[3]).all()
    # component count never exceeds box count
    assert len(merged) <= len(b)


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 10_000))
def test_adjacency_symmetric_and_matches_scalar(seed):
    b = _boxes(25, seed)
    adj = _adjacency_matrix(b, DIST)
    assert (adj == adj.T).all()
    # scalar re-implementation of the reference's calc_sim
    # (src/form_calcs.py:716-750) as ground truth
    def calc_sim(b1, b2):
        x_dist = min(abs(b2[0] - b1[2]), abs(b2[2] - b1[0]))
        y_dist = min(abs(b2[1] - b1[3]), abs(b2[3] - b1[1]))
        if b2[0] <= b1[0] and b2[1] <= b1[1] and b2[2] >= b1[2] and b2[3] >= b1[3]:
            return True
        if b1[0] <= b2[0] and b1[1] <= b2[1] and b1[2] >= b2[2] and b1[3] >= b2[3]:
            return True
        if x_dist <= DIST and b1[1] <= b2[1] and b1[3] >= b2[3]:
            return True
        if x_dist <= DIST and b2[1] <= b1[1] and b2[3] >= b1[3]:
            return True
        if y_dist <= DIST and b1[0] <= b2[0] and b1[2] >= b2[2]:
            return True
        if y_dist <= DIST and b2[0] <= b1[0] and b2[2] >= b1[2]:
            return True
        return False

    for i in range(len(b)):
        for j in range(len(b)):
            if i != j:
                assert adj[i, j] == calc_sim(b[i], b[j]), (i, j, b[i], b[j])


def test_merge_partition_idempotent():
    # feeding the merge output back in (as singleton candidates) is a no-op
    pdf = pd.DataFrame(
        {
            "annot_id": [1, 2, 3, 4],
            "tile_key": [10, 10, 10, 10],
            "tile_name": ["t"] * 4,
            "image_name": ["t_00_00", "t_00_01", "t_00_00", "t_05_05"],
            "object_class": ["closed_roof_tank"] * 2 + ["water_tower", "spherical_tank"],
            "gxmin": [0, 104, 0, 4000],
            "gymin": [0, 0, 50, 4000],
            "gxmax": [100, 200, 60, 4100],
            "gymax": [100, 90, 60, 4100],
        }
    )
    out1 = pd.concat(list(_merge_partition([pdf], DIST)), ignore_index=True)
    back = out1.rename(columns={"component_id": "annot_id"}).assign(
        image_name=[n[0] for n in out1["image_names"]]
    )[pdf.columns]
    out2 = pd.concat(list(_merge_partition([back], DIST)), ignore_index=True)
    assert len(out2) == len(out1)
    assert (
        out2[["gxmin", "gymin", "gxmax", "gymax"]].to_numpy()
        == out1[["gxmin", "gymin", "gxmax", "gymax"]].to_numpy()
    ).all()


def test_class_conflict_yields_undefined():
    pdf = pd.DataFrame(
        {
            "annot_id": [1, 2],
            "tile_key": [10, 10],
            "tile_name": ["t", "t"],
            "image_name": ["t_00_00", "t_00_01"],
            "object_class": ["closed_roof_tank", "water_tower"],
            "gxmin": [0, 104],
            "gymin": [0, 0],
            "gxmax": [100, 200],
            "gymax": [100, 100],
        }
    )
    out = pd.concat(list(_merge_partition([pdf], DIST)), ignore_index=True)
    assert len(out) == 1
    assert out["object_class"].iat[0] == "undefined_object"
    assert out["merged_bbox"].iat[0]
    assert out["image_names"].iat[0] == ["t_00_00", "t_00_01"]


def _canon(labels: np.ndarray) -> list[int]:
    """Canonicalize component labels to first-occurrence ids so two
    labelings can be compared for identical partitions."""
    seen: dict[int, int] = {}
    return [seen.setdefault(int(l), len(seen)) for l in labels]


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 10_000), st.integers(2, 200))
def test_gridded_components_match_full_matrix(seed, n):
    # mega-tile fallback must produce the exact same partition as the
    # O(n^2) path, including boxes straddling grid-cell borders
    from ast_data_pipeline_spark.operators.merge import _components_gridded

    rng = np.random.RandomState(seed)
    # spread over several 1024-px grid cells so cross-border stitching
    # is actually exercised (borders at 1024, 2048, 3072)
    x0 = rng.randint(0, 4000, n)
    y0 = rng.randint(0, 4000, n)
    w = rng.randint(1, 80, n)
    h = rng.randint(1, 80, n)
    b = np.stack([x0, y0, x0 + w, y0 + h], axis=1).astype(np.int64)
    full = _components(_adjacency_matrix(b, DIST))
    grid = _components_gridded(b, DIST)
    assert _canon(full) == _canon(grid)


def test_mega_tile_does_not_trip_max_group(monkeypatch):
    # one tile far bigger than its peers: the gridded path must engage
    # (SPLIT_THRESHOLD lowered) and return the same merge as the full
    # matrix, with no MAX_GROUP error
    import ast_data_pipeline_spark.operators.merge as M

    rng = np.random.RandomState(7)
    n = 600
    x0 = rng.randint(0, 3000, n)
    y0 = rng.randint(0, 3000, n)
    b = np.stack([x0, y0, x0 + rng.randint(1, 60, n), y0 + rng.randint(1, 60, n)], axis=1)

    def run():
        pdf = pd.DataFrame({
            "annot_id": np.arange(n),
            "tile_key": np.r_[np.zeros(n - 3, dtype=int), [1, 1, 2]],
            "tile_name": ["mega"] * (n - 3) + ["small", "small", "tiny"],
            "image_name": [f"img{i % 9}" for i in range(n)],
            "object_class": ["closed_roof_tank"] * n,
            "gxmin": b[:, 0], "gymin": b[:, 1], "gxmax": b[:, 2], "gymax": b[:, 3],
        })
        out = list(_merge_partition(iter([pdf]), DIST))[0]
        return sorted(map(tuple, out[["tile_key", "component_id", "n_members"]].values))

    baseline = run()                                   # full-matrix path
    monkeypatch.setattr(M, "SPLIT_THRESHOLD", 50)      # force gridded path
    assert run() == baseline


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 10_000), st.integers(1, 400))
def test_component_labels_match_per_tile_loop(seed, n_tiles):
    # r15: the batched (chunk-padded) adjacency + single union-find
    # must emit EXACTLY the labels of the old per-tile
    # _components(_adjacency_matrix(...)) loop — min member row index
    # per component, mega-tiles routed through the gridded path.
    import ast_data_pipeline_spark.operators.merge as M

    rng = np.random.RandomState(seed)
    sizes = rng.randint(1, 30, n_tiles)
    bounds = np.r_[0, np.cumsum(sizes)]
    n = bounds[-1]
    x0 = rng.randint(0, 2000, n)
    y0 = rng.randint(0, 2000, n)
    b = np.stack(
        [x0, y0, x0 + rng.randint(1, 80, n), y0 + rng.randint(1, 80, n)], axis=1
    ).astype(np.int32)
    ref = np.empty(n, dtype=np.int64)
    for s, e in zip(bounds[:-1], bounds[1:]):
        if e - s == 1:
            ref[s] = s
        elif e - s > M.SPLIT_THRESHOLD:
            ref[s:e] = s + M._components_gridded(b[s:e], DIST)
        else:
            ref[s:e] = s + M._components(M._adjacency_matrix(b[s:e], DIST))
    assert np.array_equal(ref, M._component_labels(b, bounds, DIST))


def test_component_labels_mega_tile_routes_gridded(monkeypatch):
    # mixed partition with one tile over SPLIT_THRESHOLD: labels still
    # equal the reference composition (gridded for the big slice)
    import ast_data_pipeline_spark.operators.merge as M

    monkeypatch.setattr(M, "SPLIT_THRESHOLD", 50)
    rng = np.random.RandomState(3)
    sizes = np.r_[rng.randint(1, 20, 40), 120, rng.randint(1, 20, 40)]
    bounds = np.r_[0, np.cumsum(sizes)]
    n = bounds[-1]
    x0 = rng.randint(0, 3000, n)
    y0 = rng.randint(0, 3000, n)
    b = np.stack(
        [x0, y0, x0 + rng.randint(1, 60, n), y0 + rng.randint(1, 60, n)], axis=1
    ).astype(np.int32)
    ref = np.empty(n, dtype=np.int64)
    for s, e in zip(bounds[:-1], bounds[1:]):
        if e - s == 1:
            ref[s] = s
        elif e - s > 50:
            ref[s:e] = s + M._components_gridded(b[s:e], DIST)
        else:
            ref[s:e] = s + M._components(M._adjacency_matrix(b[s:e], DIST))
    assert np.array_equal(ref, M._component_labels(b, bounds, DIST))
