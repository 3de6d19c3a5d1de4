#!/usr/bin/env python
"""Registry-wide single-reducer audit: list every physical Window node
with NO partition spec but WITH an ordering (the global-sort smell) in
every registered query's plan at sf0.01.

A hit is not automatically a defect — the repo intentionally runs
un-partitioned windows over TINY frames (bucket-count tables, daily
series, post-TakeOrdered top-k results); the audit exists so every hit
is a *reviewed* decision. Current classification of the r7 audit
(19 hits, zero WATCH — r6's sole WATCH item, the e_rfm_scores global
ntile(4) over the user table, was rewritten to exact_group_quantiles
rank-selected cuts + broadcast banding and no longer appears):

- fixed-replicate frames (50-row subsample means): x_subsample_ci
- tiny bucket/offset tables (two-level prefix pattern): a_ks_two_sample,
  a_skyline_2d, a_quantile_sketch_eval (256-bin histogram),
  x_range_partition_bounds, e_cusum_changepoint (daily series),
  x_vocab_growth, t_peak_concurrency, a_winsorized_mean (the
  exact_group_quantiles bucket-count table; its lit-constant group col
  is constant-folded out of the partition spec, so it prints as
  un-partitioned — the frame is the ~bucket-count rows, not the fact)
- daily-series frames (<= one row per calendar day): t_rolling_corr,
  t_seasonal_decompose (centered 7-day trend + full-window count over
  the daily grain — the fact table aggregated away first),
  e_survival_km (cumulative risk-set count + survival-product chain
  over the ~30-row event-time table)
- post-TakeOrdered top-k rank (window sees <= k*partitions rows):
  e_topk_users_by_value, x_heavy_hitters, a_countmin_sketch, j_skew_report
- entity-sized frames mirroring reference semantics (global allocation
  order over the blank-chip subset): d_f7_verifier_allocation,
  d_tracking_pipeline; source-count frames: x_gini_source_concentration
"""

from __future__ import annotations

import pathlib
import re
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def unpartitioned_ordered_windows(plan: str) -> list[str]:
    out = []
    for ln in plan.splitlines():
        s = ln.strip()
        if not ("Window [" in s and "windowspecdefinition(" in s):
            continue
        spec = s.split("windowspecdefinition(", 1)[1]
        # partition columns come first with no ASC/DESC marker; an
        # ordered-but-unpartitioned spec starts straight at "col ASC"
        first_arg = spec.split(",", 1)[0]
        if re.search(r"(ASC|DESC)", first_arg):
            out.append(s[:160])
    return out


def main() -> None:
    from ast_data_pipeline_spark.registry import load_all
    from ast_data_pipeline_spark.session import get_spark

    spark = get_spark("window-audit")
    hits = {}
    for name, spec in load_all().items():
        try:
            plan = (
                spec.fn(spark, "/root/testdata/sf0.01")
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as e:  # pragma: no cover
            print("ERR", name, str(e)[:120])
            continue
        bad = unpartitioned_ordered_windows(plan)
        if bad:
            hits[name] = bad
    for name, bad in sorted(hits.items()):
        print(name, "n=", len(bad), "::", bad[0])
    print("TOTAL", len(hits))
    spark.stop()


if __name__ == "__main__":
    main()
