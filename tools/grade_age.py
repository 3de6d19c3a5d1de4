"""Grade-age audit: which registered queries have a driver grade older
than the code they depend on? (VERDICT r9 #2.)

The driver's correctness gate grades a ~50-query prefix of
``registry._PRIORITY`` per round, so a query graded green in r01 may
since have had its module — or a shared dependency like
``sources/domain_views.py`` or ``functions/exact.py`` — rewritten
without ever being re-graded. This tool makes staleness visible and
produces the rotation order for the next round's window:

1. **never graded** — no green row in any ``CORRECTNESS_r*.json``;
2. **stale** — some file in the query's import closure has a git
   commit NEWER than the round artifact that last graded it green
   (ordered most-stale-first by commit-minus-grade age);
3. **fresh** — ordered oldest-grade-first (so re-proof budget goes to
   the longest-unverified greens).

"Code path" granularity is the FILE import closure: the module that
defines the query function plus every package-internal module it
transitively imports. File-level is deliberately conservative — any
edit to ``queries/text.py`` marks all its queries stale; false
staleness only costs re-grade budget, false freshness would hide a
regression.

Usage::

    python tools/grade_age.py           # table + summary
    python tools/grade_age.py --window  # just the rotation order
"""

from __future__ import annotations

import ast
import glob
import inspect
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
PKG = "ast_data_pipeline_spark"


def _git_last_commit_ts(paths: list[str]) -> int:
    out = subprocess.run(
        ["git", "log", "-1", "--format=%ct", "--", *paths],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.strip()
    return int(out) if out else 0


def _module_file(mod_name: str) -> str | None:
    rel = mod_name.replace(".", "/")
    for cand in (f"{rel}.py", f"{rel}/__init__.py"):
        p = os.path.join(REPO, cand)
        if os.path.exists(p):
            return p
    return None


def _package_imports(path: str) -> set[str]:
    """Package-internal module names imported by ``path``."""
    tree = ast.parse(open(path, encoding="utf-8").read())
    mods: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            mods.update(a.name for a in node.names if a.name.startswith(PKG))
        elif isinstance(node, ast.ImportFrom) and node.module and node.module.startswith(PKG):
            mods.add(node.module)
            # "from pkg.queries import text" style: the names may be modules
            for a in node.names:
                if _module_file(f"{node.module}.{a.name}"):
                    mods.add(f"{node.module}.{a.name}")
    return mods


def _import_closure(start_file: str, cache: dict[str, set[str]]) -> set[str]:
    seen: set[str] = set()
    frontier = [start_file]
    while frontier:
        f = frontier.pop()
        if f in seen:
            continue
        seen.add(f)
        if f not in cache:
            cache[f] = _package_imports(f)
        for mod in cache[f]:
            mf = _module_file(mod)
            if mf and mf not in seen:
                frontier.append(mf)
    return seen


def _grade_history() -> tuple[dict[str, int], dict[int, int]]:
    """(query -> last green round, round -> artifact commit ts)."""
    last_green: dict[str, int] = {}
    round_ts: dict[int, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        round_ts[rnd] = _git_last_commit_ts([os.path.basename(path)])
        data = json.load(open(path))
        for q, v in data.items():
            if not isinstance(v, dict):
                continue
            # rows-only queries (no oracle by design) record
            # err == 'no_oracle' with a live row count — the driver's
            # weaker green.
            if v.get("err") == "no_oracle" and (v.get("spark_rows") or 0) > 0:
                last_green[q] = max(last_green.get(q, 0), rnd)
                continue
            if v.get("err"):
                continue
            hash_ok = v.get("hash_match")
            if v.get("rows_match") and (hash_ok is True or hash_ok is None):
                last_green[q] = max(last_green.get(q, 0), rnd)
    return last_green, round_ts


def audit() -> list[dict]:
    from ast_data_pipeline_spark.registry import load_all

    last_green, round_ts = _grade_history()
    cache: dict[str, set[str]] = {}
    rows = []
    for name, spec in load_all().items():
        src = inspect.getsourcefile(inspect.unwrap(spec.fn))
        closure = sorted(_import_closure(src, cache))
        code_ts = _git_last_commit_ts([os.path.relpath(f, REPO) for f in closure])
        rnd = last_green.get(name)
        grade_ts = round_ts.get(rnd, 0) if rnd else 0
        status = (
            "never-graded" if rnd is None
            else "stale" if code_ts > grade_ts
            else "fresh"
        )
        rows.append({
            "query": name, "status": status, "graded_round": rnd,
            "grade_ts": grade_ts, "code_ts": code_ts,
            "age": code_ts - grade_ts,
            "module": os.path.relpath(src, REPO),
        })
    return rows


def rotation_order(rows: list[dict]) -> list[str]:
    never = [r for r in rows if r["status"] == "never-graded"]
    stale = sorted((r for r in rows if r["status"] == "stale"),
                   key=lambda r: -r["age"])
    fresh = sorted((r for r in rows if r["status"] == "fresh"),
                   key=lambda r: (r["graded_round"], r["query"]))
    return [r["query"] for r in never + stale + fresh]


def main() -> None:
    rows = audit()
    if "--window" in sys.argv:
        for q in rotation_order(rows):
            print(q)
        return
    by_status: dict[str, int] = {}
    for r in rows:
        by_status[r["status"]] = by_status.get(r["status"], 0) + 1
    print(f"{'query':46s} {'status':13s} {'round':>5s} {'age_days':>9s}  module")
    for r in sorted(rows, key=lambda r: (r["status"] != "never-graded",
                                         r["status"] != "stale", -r["age"])):
        age_d = r["age"] / 86400 if r["status"] == "stale" else 0
        print(f"{r['query']:46s} {r['status']:13s} "
              f"{str(r['graded_round'] or '-'):>5s} {age_d:9.2f}  {r['module']}")
    print("\nsummary:", json.dumps(by_status))
    print("window head (first 50):")
    for q in rotation_order(rows)[:50]:
        print(" ", q)


if __name__ == "__main__":
    main()
