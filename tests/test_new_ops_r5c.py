"""Invariant tests for the late-r5 operators: triangle census, EWMA,
linear interpolation, RFM segmentation.

Each query also carries a DuckDB oracle (the driver's hash gate); the
tests here pin the MATH the oracle can't state — brute-force triangle
equality, convexity of the interpolation, quartile balance.
"""

from __future__ import annotations

import pandas as pd
import pytest

from ast_data_pipeline_spark.registry import load_all


def _run(spark, sf_dir, name: str) -> pd.DataFrame:
    return load_all()[name].fn(spark, sf_dir).toPandas()


def test_triangle_count_matches_bruteforce(spark, sf_dir):
    out = _run(spark, sf_dir, "x_triangle_count")
    assert len(out) == 1
    row = out.iloc[0]

    # Brute force on the same co-order graph via pandas sets.
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
    pairs = set()
    for _, grp in li.drop_duplicates().groupby("l_orderkey"):
        parts = sorted(set(grp["l_partkey"]))
        for i, a in enumerate(parts):
            for b in parts[i + 1 :]:
                pairs.add((a, b))
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    # Each triangle is counted once per its 3 edges.
    tri = sum(len(adj[a] & adj[b]) for a, b in pairs) // 3
    wedges = sum(len(v) * (len(v) - 1) // 2 for v in adj.values())

    assert row["n_nodes"] == len(adj)
    assert row["n_edges"] == len(pairs)
    assert row["n_wedges"] == wedges
    assert row["n_triangles"] == tri
    assert 0.0 <= row["global_clustering"] <= 1.0
    # 3T <= W always (every triangle contributes 3 wedges).
    assert 3 * row["n_triangles"] <= row["n_wedges"]


def test_ewma_bounds_and_head(spark, sf_dir):
    out = _run(spark, sf_dir, "t_ewma")
    assert (out["ewma"].notna()).all()
    for _, g in out.groupby("event_type"):
        g = g.sort_values("day").reset_index(drop=True)
        # First row has no lags: EWMA == the daily value exactly.
        assert g.loc[0, "ewma"] == g.loc[0, "daily_value"]
        # Convex combination: EWMA lies within the running 8-row envelope.
        for i in range(len(g)):
            window = g["daily_value"].iloc[max(0, i - 7) : i + 1]
            assert window.min() - 1e-9 <= g.loc[i, "ewma"] <= window.max() + 1e-9


def test_interp_linear_brackets(spark, sf_dir):
    out = _run(spark, sf_dir, "t_interp_linear")
    obs = out[~out["is_interpolated"]]
    # Observed rows pass through untouched.
    assert (obs["value_interp"] == obs["observed"]).all()
    filled = out[out["is_interpolated"]]
    assert filled["observed"].isna().all()
    assert filled["value_interp"].notna().all()
    # Each filled value lies between its bracketing observations.
    for et, g in out.groupby("event_type"):
        g = g.sort_values("hour").reset_index(drop=True)
        vals = g["observed"].tolist()
        interp = g["value_interp"].tolist()
        n = len(g)
        for i in range(n):
            if not g.loc[i, "is_interpolated"]:
                continue
            lo = next(vals[j] for j in range(i, -1, -1) if pd.notna(vals[j]))
            hi = next(vals[j] for j in range(i, n) if pd.notna(vals[j]))
            lo, hi = min(lo, hi), max(lo, hi)
            assert lo - 1e-9 <= interp[i] <= hi + 1e-9, (et, i)


def test_rfm_quartiles_banded(spark, sf_dir):
    # r7 semantics: quartile banding by rank-selected cut VALUES (no
    # global ntile) — ties share a score, bands are monotone in the
    # metric, and each band holds at most ~a quartile of the rank mass
    # plus whatever ties straddle the cut.
    out = _run(spark, sf_dir, "e_rfm_scores")
    n = len(out)
    assert out["user_id"].is_unique
    metric_of = {"r_score": "recency_days", "f_score": "frequency",
                 "m_score": "monetary"}
    for col, metric in metric_of.items():
        assert set(out[col]) <= {1, 2, 3, 4}
        # ties share a score
        assert (out.groupby(metric)[col].nunique() == 1).all(), col
        # banding is monotone in the metric (descending for recency)
        srt = out.sort_values(metric)[col]
        diffs = srt.diff().dropna()
        assert (diffs >= 0).all() if col != "r_score" else (diffs <= 0).all(), col
        # the sub-cut mass of each band is at most the quartile rank:
        # strictly-below-band-k rows never exceed k/4 of the population
        for k in (1, 2, 3):
            below = (out[col] <= k).sum() if col != "r_score" else (out[col] >= 5 - k).sum()
            # ties straddling a cut inflate the band; bound by the tie mass
            biggest_tie = out.groupby(metric).size().max()
            assert below <= (n * k) // 4 + biggest_tie, (col, k, below)
    # Orientation: score 4 = best (lowest recency_days / highest freq+spend).
    assert (
        out[out["r_score"] == 4]["recency_days"].max()
        <= out[out["r_score"] == 1]["recency_days"].min()
    )
    assert (
        out[out["f_score"] == 4]["frequency"].min()
        >= out[out["f_score"] == 1]["frequency"].max()
    )
    seg = out["segment"].str.split("-", expand=True).astype(int)
    assert (seg[0] == out["r_score"]).all()


def test_true_ffd_beats_both_nextfit_variants(spark, sf_dir):
    """The classic bin-packing hierarchy, verified on real data: true
    first-fit-decreasing (all bins revisitable) needs no more packs
    than either single-pass next-fit variant the registered query
    compares — the reason x_packing_efficiency's honest finding
    (sorting does not help NEXT-fit) is not a contradiction of the
    FFD folklore."""
    from ast_data_pipeline_spark.queries.text import PACKCMP_BUDGET
    from ast_data_pipeline_spark.registry import load_all

    got = load_all()["x_packing_efficiency"].fn(spark, sf_dir).toPandas()
    from ast_data_pipeline_spark.operators.text import BPE_ISH  # noqa: F401
    import re

    from ast_data_pipeline_spark.sources.catalog import load

    docs = load(spark, sf_dir, "documents").select("source", "doc_id", "text").toPandas()
    docs["n"] = [len(re.findall(r"\w+|[^\w\s]", t)) for t in docs["text"]]
    for src, grp in docs.groupby("source"):
        sizes = sorted(grp["n"], reverse=True)
        bins: list[int] = []
        for n in sizes:  # true first-fit-decreasing
            for i, fill in enumerate(bins):
                if fill + n <= PACKCMP_BUDGET:
                    bins[i] = fill + n
                    break
            else:
                bins.append(n)
        ffd_packs = len(bins)
        for method in ("a_nextfit_arrival", "b_nextfit_decreasing"):
            nf = int(
                got[(got.source == src) & (got.method == method)]["n_packs"].iloc[0]
            )
            assert ffd_packs <= nf, (src, method, ffd_packs, nf)
