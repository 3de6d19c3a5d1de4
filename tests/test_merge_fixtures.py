"""The hand-computable merge cases FIXTURES.md §3 requires
(ref semantics: src/form_calcs.py:716-792, dist_limit=5)."""

from __future__ import annotations

import pandas as pd

from ast_data_pipeline_spark.operators.merge import _merge_partition

DIST = 5


def _run(rows):
    cols = [
        "annot_id", "tile_key", "tile_name", "image_name", "object_class",
        "gxmin", "gymin", "gxmax", "gymax",
    ]
    pdf = pd.DataFrame(rows, columns=cols)
    return pd.concat(list(_merge_partition([pdf], DIST)), ignore_index=True)


def _row(aid, bbox, img="t_00_00", cls="closed_roof_tank"):
    return (aid, 1, "t", img, cls, *bbox)


def test_adjacent_chips_within_5px_merge():
    # two truncated boxes in adjacent chips, 4 px apart in x, y-covered
    out = _run([
        _row(1, (500, 100, 511, 150), img="t_00_00"),
        _row(2, (515, 105, 600, 145), img="t_00_01"),
    ])
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.gxmin, r.gymin, r.gxmax, r.gymax) == (500, 100, 600, 150)
    assert r.image_names == ["t_00_00", "t_00_01"]
    assert r.merged_bbox


def test_chain_merges_transitively():
    # A-B adjacent, B-C adjacent, A-C far: one component of three
    out = _run([
        _row(1, (0, 0, 100, 50)),
        _row(2, (104, 0, 200, 50)),   # 4px from A
        _row(3, (204, 0, 300, 50)),   # 4px from B, 104px from A
    ])
    assert len(out) == 1
    assert out.iloc[0].n_members == 3
    assert (out.iloc[0].gxmin, out.iloc[0].gxmax) == (0, 300)


def test_six_px_apart_does_not_merge():
    out = _run([
        _row(1, (0, 0, 100, 50)),
        _row(2, (107, 0, 200, 50)),  # x_dist = 7 > 5
    ])
    assert len(out) == 2
    assert not out.merged_bbox.any()


def test_containment_merges():
    out = _run([
        _row(1, (0, 0, 200, 200)),
        _row(2, (50, 50, 100, 100)),  # fully inside
    ])
    assert len(out) == 1
    assert (out.iloc[0].gxmin, out.iloc[0].gymin, out.iloc[0].gxmax, out.iloc[0].gymax) == (
        0, 0, 200, 200,
    )


def test_close_but_not_covered_does_not_merge():
    # within 5px in x but neither covers the other in y -> no merge
    # (the reference's calc_sim requires full coverage in the other axis)
    out = _run([
        _row(1, (0, 0, 100, 50)),
        _row(2, (104, 25, 200, 75)),
    ])
    assert len(out) == 2


def test_class_conflict_intended_semantics():
    out = _run([
        _row(1, (0, 0, 100, 50), cls="closed_roof_tank"),
        _row(2, (104, 0, 200, 50), cls="water_tower"),
    ])
    assert len(out) == 1
    assert out.iloc[0].object_class == "undefined_object"
