#!/usr/bin/env python
"""Bench regression guard: diff a fresh bench run against the last
recorded round.

The driver records ``BENCH_r{N}.json`` per round (either the raw
``bench.py`` JSON line, or a wrapper with the parsed line under
``"parsed"``). Run-to-run JVM/JIT jitter on sub-second queries looks
identical to a real regression in a single number — this tool makes the
comparison mechanical: per-query ratios against the newest committed
round, flagged past a threshold, with small absolute deltas ignored so
100 ms of JIT noise on a 150 ms query doesn't page anyone.

Usage:
    python tools/bench_diff.py                      # run bench.py now, diff vs newest BENCH_r*.json
    python tools/bench_diff.py new.json             # diff a saved bench line vs newest round
    python tools/bench_diff.py new.json old.json    # explicit pair
    python tools/bench_diff.py --threshold 2.0 ...
    python tools/bench_diff.py --prefix BENCH_SF1_r --sf-dir /tmp/ast_sf1
                                                    # sf1 pair: run bench at sf1,
                                                    # diff vs newest BENCH_SF1_r*.json

The ``--prefix``/``--sf-dir`` pair supports the second bench scale
point (VERDICT r11 #5): ``BENCH_SF1_r{N}.json`` is recorded each
round at the deterministic sf1 expansion, so wall-time SCALING
regressions surface as same-sf cross-round data instead of being
inferred from the saturated sf0.1 gate. A same-run sf mismatch
(old and new recorded at different sf) is flagged loudly — ratios
across scales are meaningless.

Exit code 1 iff any query regressed more than ``--threshold`` (default
1.5x) AND by more than ``--min-abs-delta`` seconds (default 0.3 s).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _extract(doc: dict) -> dict:
    """Accept either a raw bench line or the driver's {'parsed': ...} wrapper."""
    if "queries" in doc:
        return doc
    if isinstance(doc.get("parsed"), dict) and "queries" in doc["parsed"]:
        return doc["parsed"]
    raise SystemExit(f"no 'queries' dict found in bench JSON (keys: {list(doc)})")


def load_bench(path: str) -> dict:
    with open(path) as f:
        return _extract(json.load(f))


def newest_round_bench(prefix: str = "BENCH_r") -> str:
    # exclude longer prefixes that share the stem (BENCH_r must not
    # match BENCH_SF1_r files and vice versa)
    rx = re.compile(re.escape(prefix) + r"(\d+)\.json$")
    paths = [
        p
        for p in glob.glob(os.path.join(REPO, f"{prefix}*.json"))
        if rx.search(os.path.basename(p))
    ]
    if not paths:
        raise SystemExit(f"no {prefix}*.json found — nothing to diff against")
    return max(paths, key=lambda p: int(rx.search(p).group(1)))


def run_bench_now(sf_dir: str | None = None) -> dict:
    env = dict(os.environ)
    if sf_dir:
        env["SPARK_GRAFT_SF_DIR"] = sf_dir
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, check=False,
    )
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return _extract(json.loads(line))
    raise SystemExit(f"bench.py produced no JSON line (rc={out.returncode}):\n{out.stderr[-2000:]}")


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("new", nargs="?", help="bench JSON to grade (default: run bench.py now)")
    ap.add_argument("old", nargs="?", help="baseline bench JSON (default: newest BENCH_r*.json)")
    ap.add_argument("--threshold", type=float, default=1.5,
                    help="flag ratio above this (default 1.5)")
    ap.add_argument("--min-abs-delta", type=float, default=0.3,
                    help="ignore regressions smaller than this many seconds (default 0.3)")
    ap.add_argument("--prefix", default="BENCH_r",
                    help="round-artifact prefix to diff against (e.g. BENCH_SF1_r)")
    ap.add_argument("--sf-dir", default=None,
                    help="SPARK_GRAFT_SF_DIR for the fresh bench run (e.g. /tmp/ast_sf1)")
    a = ap.parse_args()

    old_path = a.old or newest_round_bench(a.prefix)
    old = load_bench(old_path)
    new = load_bench(a.new) if a.new else run_bench_now(a.sf_dir)

    if old.get("sf") is not None and new.get("sf") is not None and old["sf"] != new["sf"]:
        print(f"WARNING: sf mismatch — old sf={old['sf']} vs new sf={new['sf']}; "
              "cross-scale ratios are meaningless (pass --prefix/--sf-dir for a same-sf pair)")

    # Box-drift normalization (VERDICT r12 #8): when both runs carry
    # the fixed-work calib probe, their ratio measures BOX speed drift
    # (co-tenant load, CPU steal), not engine change. Per-query ratios
    # are reported both raw and divided by the drift factor, and the
    # regression flag uses the NORMALIZED ratio — a round where every
    # query moved +30% together with calib is a slow box, not a slow
    # engine.
    drift = None
    if old.get("calib_sec") and new.get("calib_sec"):
        drift = new["calib_sec"] / old["calib_sec"]

    oq, nq = old["queries"], new["queries"]
    rows, regressions = [], []
    for name in sorted(set(oq) | set(nq)):
        if name not in oq:
            rows.append((name, None, nq[name], None, None, "NEW"))
            continue
        if name not in nq:
            rows.append((name, oq[name], None, None, None, "DROPPED"))
            continue
        ratio = nq[name] / oq[name] if oq[name] > 0 else float("inf")
        norm = ratio / drift if drift else None
        eff = norm if norm is not None else ratio
        flag = ""
        # Jitter guard on the DRIFT-NORMALIZED absolute delta (ADVICE
        # r13): comparing the raw delta on a drifted box can suppress a
        # real regression (box got faster) or admit pure drift (box got
        # slower) inconsistently with the normalized ratio test above.
        abs_delta = nq[name] - oq[name] * (drift if drift else 1.0)
        if eff > a.threshold and abs_delta > a.min_abs_delta:
            flag = "REGRESSION"
            regressions.append(name)
        elif eff > a.threshold:
            flag = "noise"  # ratio tripped but absolute delta is jitter-scale
        rows.append((name, oq[name], nq[name], ratio, norm, flag))

    w = max(len(r[0]) for r in rows)
    print(f"baseline: {old_path}")
    if drift is not None:
        print(f"box drift (new calib {new['calib_sec']:.3f}s / old calib "
              f"{old['calib_sec']:.3f}s): {drift:.2f}x — 'norm' column and "
              "regression flags are drift-normalized")
    # box context (VERDICT r8 #10): loadavg recorded in the bench JSON
    # separates co-tenant drift from plan regressions at read time
    for label, doc in (("old", old), ("new", new)):
        la_b, la_a = doc.get("loadavg_before"), doc.get("loadavg_after")
        if la_b or la_a:
            print(f"{label} loadavg: before={la_b} after={la_a}")
    print(f"{'query'.ljust(w)}  {'old':>7}  {'new':>7}  {'ratio':>6}  {'norm':>6}  flag")
    for name, o, n, ratio, norm, flag in rows:
        os_ = f"{o:.3f}" if o is not None else "-"
        ns_ = f"{n:.3f}" if n is not None else "-"
        rs = f"{ratio:.2f}" if ratio is not None else "-"
        nrs = f"{norm:.2f}" if norm is not None else "-"
        print(f"{name.ljust(w)}  {os_:>7}  {ns_:>7}  {rs:>6}  {nrs:>6}  {flag}")
    tot_o = sum(v for v in oq.values())
    tot_n = sum(v for v in nq.values())
    print(f"{'TOTAL'.ljust(w)}  {tot_o:>7.3f}  {tot_n:>7.3f}  {tot_n / tot_o:>6.2f}")
    if regressions:
        print(f"\nFAIL: {len(regressions)} regression(s): {', '.join(regressions)}")
        return 1
    print("\nOK: no per-query regression above "
          f"{a.threshold}x (+{a.min_abs_delta}s abs)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
