#!/usr/bin/env python
"""Registry-wide single-reducer audit: list every physical Window node
with NO partition spec but WITH an ordering (the global-sort smell) in
every registered query's plan at sf0.01.

A hit is not automatically a defect — the repo intentionally runs
un-partitioned windows over TINY frames (bucket-count tables, daily
series, post-TakeOrdered top-k results); the audit exists so every hit
is a *reviewed* decision. The reviewed set lives in ``CLASSIFIED``
below (machine-readable — tests/test_plan_audits.py fails when a query
hits the audit without an entry there, closing the r7 gap where a new
global window shipped unclassified). Rationale per class:

- fixed-replicate frames (50-row subsample means): x_subsample_ci
- tiny bucket/offset tables (two-level prefix pattern): a_ks_two_sample,
  a_skyline_2d, a_quantile_sketch_eval (256-bin histogram),
  x_range_partition_bounds, e_cusum_changepoint (daily series),
  x_vocab_growth, t_peak_concurrency, a_winsorized_mean (the
  exact_group_quantiles bucket-count table; its lit-constant group col
  is constant-folded out of the partition spec, so it prints as
  un-partitioned — the frame is the ~bucket-count rows, not the fact),
  a_roc_auc / a_kruskal_wallis / a_spearman_corr / a_dunn_test (r11
  rank statistics: the global prefix runs over the floor(value)
  bucket table — ~500 rows — and, for spearman, the 24-row hour
  table; the fact-scale work is the local window partitioned by bkt)
- daily-series frames (<= one row per calendar day): t_rolling_corr,
  t_seasonal_decompose (centered 7-day trend + full-window count over
  the daily grain — the fact table aggregated away first),
  e_survival_km (cumulative risk-set count + survival-product chain
  over the ~30-row event-time table)
- post-TakeOrdered top-k rank (window sees <= k rows after an
  orderBy+limit that compiles to per-partition heaps):
  e_topk_users_by_value, x_heavy_hitters, a_countmin_sketch,
  j_skew_report, x_bm25_search (12-row df-rank frame, r8 rewrite),
  x_rrf_fusion (two 50-row post-limit ranker pools),
  x_vocab_coverage (1000-row post-limit frequency head),
  x_pq_adc_recall (16-row post-limit codebook-seed rank — the PQ seed
  set is orderBy(md5)+limit(K) then ranked within the K rows),
  d_f7_verifier_allocation (200-row allocation head),
  d_tracking_pipeline (150-row allocation head, r8 rewrite — was the
  last chip-cardinality global frame)
- source-count frames: x_gini_source_concentration
"""

from __future__ import annotations

import pathlib
import re
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

# Reviewed un-partitioned-ordered-window hits (rationale in the module
# docstring). A query appearing in the audit output but NOT here fails
# tests/test_plan_audits.py — classify it there (with a docstring
# rationale) or repartition/TakeOrdered it away.
CLASSIFIED: frozenset[str] = frozenset(
    {
        "x_subsample_ci",
        "a_ks_two_sample",
        "a_roc_auc",
        "a_kruskal_wallis",
        "a_spearman_corr",
        "a_dunn_test",
        "a_skyline_2d",
        "a_quantile_sketch_eval",
        "x_range_partition_bounds",
        "e_cusum_changepoint",
        "x_vocab_growth",
        "t_peak_concurrency",
        "a_winsorized_mean",
        "t_rolling_corr",
        "t_seasonal_decompose",
        "e_survival_km",
        "e_topk_users_by_value",
        "x_heavy_hitters",
        "a_countmin_sketch",
        "j_skew_report",
        "x_bm25_search",
        "x_rrf_fusion",
        "x_vocab_coverage",
        "x_pq_adc_recall",
        "d_f7_verifier_allocation",
        "d_tracking_pipeline",
        "x_gini_source_concentration",
    }
)


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


def audit(spark, sf_dir: str = "/root/testdata/sf0.01") -> dict[str, list[str]]:
    """Return {query_name: [window plan lines]} for every registered
    query whose physical plan contains an un-partitioned ordered
    Window. Shared by the CLI and the pytest guard.

    Planning is driver-side Catalyst work (plus the handful of
    driver-loop queries that run real jobs while building their
    frame); py4j releases the GIL during JVM calls, so a thread pool
    overlaps the per-query planning latency. 8 threads took the
    serial ~3 min registry pass to ~55 s (VERDICT r11 #7 — the ritual
    must stay cheap or it silently stops being run)."""
    from concurrent.futures import ThreadPoolExecutor

    from ast_data_pipeline_spark.registry import load_all

    def plan_of(item):
        name, spec = item
        try:
            plan = (
                spec.fn(spark, sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as e:  # pragma: no cover
            print("ERR", name, str(e)[:120])
            return name, []
        return name, unpartitioned_ordered_windows(plan)

    # Warm the executor's addPyFile dependency fetch with ONE task
    # before fanning out: concurrent FIRST fetches of the shipped
    # package zip race in local mode ("exists and does not match
    # contents of" copyFile failures when 8 planning jobs start
    # simultaneously on a cold session).
    spark.sparkContext.parallelize([0], 1).count()
    with ThreadPoolExecutor(max_workers=8) as pool:
        results = list(pool.map(plan_of, load_all().items()))
    return {name: bad for name, bad in results if bad}


def main() -> None:
    from ast_data_pipeline_spark.session import get_spark

    spark = get_spark("window-audit")
    hits = audit(spark)
    for name, bad in sorted(hits.items()):
        flag = "" if name in CLASSIFIED else "  <-- WATCH (unclassified)"
        print(name, "n=", len(bad), "::", bad[0], flag)
    unclassified = sorted(set(hits) - CLASSIFIED)
    print("TOTAL", len(hits), "UNCLASSIFIED", len(unclassified), unclassified)
    spark.stop()


if __name__ == "__main__":
    main()
