"""Query registry — the driver contract surface.

Every implemented operator from SURVEY.md §2 registers here as a named
query: a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (where
SQL-expressible) a DuckDB oracle SQL string over the same parquet
tables.  ``__spark_entry__.py`` exposes this registry to the driver.
"""

from __future__ import annotations

import importlib
import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => driver does rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}

# Modules that register queries on import.
_QUERY_MODULES = [
    "ast_data_pipeline_spark.queries.aggregates",
    "ast_data_pipeline_spark.queries.joins",
    "ast_data_pipeline_spark.queries.projections",
    "ast_data_pipeline_spark.queries.setops_windows",
    "ast_data_pipeline_spark.queries.domain",
    "ast_data_pipeline_spark.queries.merge",
    "ast_data_pipeline_spark.queries.spatial",
    "ast_data_pipeline_spark.queries.dedup",
    "ast_data_pipeline_spark.queries.similarity",
    "ast_data_pipeline_spark.queries.text",
    "ast_data_pipeline_spark.queries.events",
    "ast_data_pipeline_spark.queries.temporal",
    "ast_data_pipeline_spark.queries.sampling",
    "ast_data_pipeline_spark.queries.graph",
    "ast_data_pipeline_spark.queries.tpch_shapes",
    "ast_data_pipeline_spark.queries.events_streaming",
    "ast_data_pipeline_spark.queries.pipelines",
    "ast_data_pipeline_spark.queries.multimodal",
    "ast_data_pipeline_spark.queries.sources_sinks",
]


def register(name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            # Last-wins dict semantics silently shadowed a query once
            # (r6: two e_cohort_retention registrations) — fail loudly.
            raise ValueError(f"duplicate query registration: {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco


# Grading priority: the driver's correctness gate walks ``load_all()``
# in iteration order (and may stop at a budgeted prefix, historically
# 50). The order lives in ``registry_priority.txt`` — a GENERATED data
# file (``python tools/grade_age.py --write-priority``), deliberately
# not Python so that per-round window rotations never touch this
# module: every query module imports registry.py, so a regenerated
# tuple here marked all ~356 query import closures stale every round
# and destroyed grade_age's staleness signal (VERDICT r10 #2).
# COVERAGE.md documents the rotation policy; tests/test_coverage_doc.py
# enforces registry<->priority set equality.
_PRIORITY_FILE = os.path.join(os.path.dirname(__file__), "registry_priority.txt")
with open(_PRIORITY_FILE, encoding="utf-8") as _pf:
    _PRIORITY: tuple[str, ...] = tuple(
        ln.strip() for ln in _pf if ln.strip() and not ln.startswith("#")
    )


def load_all() -> dict[str, QuerySpec]:
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            # Allow partially-built surface during development; only
            # swallow "module itself missing", not errors inside it.
            if e.name != mod:
                raise
    ordered: dict[str, QuerySpec] = {}
    for name in _PRIORITY:
        if name in _REGISTRY:
            ordered[name] = _REGISTRY[name]
    for name, spec in _REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered
