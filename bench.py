#!/usr/bin/env python
"""Benchmark runner (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import pathlib
import re
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from ast_data_pipeline_spark.registry import load_all  # noqa: E402
from ast_data_pipeline_spark.session import get_spark  # noqa: E402

# Headline queries; expanded as the surface grows (tag "bench").


def main() -> None:
    # Bench grades PER-QUERY engine cost: the session view cache
    # (sources/domain_views._memo) is a sweep optimization that would
    # bill the first d_* query for materializing every domain view's
    # full column set (~13 s at sf0.1) and hand later ones a warm
    # cache — misattributing cost across queries and drowning the
    # per-query signal bench exists to produce. Measure raw lineage;
    # an explicit SPARK_GRAFT_CACHE_VIEWS=1 still overrides.
    os.environ.setdefault("SPARK_GRAFT_CACHE_VIEWS", "0")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    specs = load_all()
    bench_names = sorted(n for n, s in specs.items() if "bench" in s.tags) or sorted(specs)

    spark = get_spark("ast-bench")
    timings: dict[str, float] = {}

    # timed runs per query, keep the min — the bench box shows
    # co-tenant jitter (2-5x outliers on single queries, confirmed by
    # idle-CPU/high-loadavg readings). min-of-3 normally suffices; when
    # the three samples still disagree by >2x the burst likely spanned
    # all of them, so take up to 2 extra samples before recording.
    for name in bench_names:
        samples: list[float] = []
        while True:
            df = specs[name].fn(spark, sf_dir)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
            if len(samples) >= 5 or (
                len(samples) >= 3 and max(samples) / min(samples) <= 2.0
            ):
                break
        timings[name] = round(min(samples), 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
