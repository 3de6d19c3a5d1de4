"""The reliable-checkpoint knob (VERDICT r9 #1).

Every iterative lineage cut routes through ``lineage.lineage_cut`` /
``lineage_cut_lazy``; ``SPARK_GRAFT_CKPT_DIR`` switches them from
executor-local ``localCheckpoint`` (fast, not fault-tolerant) to
reliable ``DataFrame.checkpoint`` (survives executor death on a real
cluster). Both modes must produce byte-identical results — the knob
trades recovery for IO, never semantics.

``x_dedup_clusters`` is the canary: its hash-min connected-components
loop is the deepest iterative consumer of the cut helper (cuts inside
every round plus the shared signature frame).
"""

from __future__ import annotations

import os

import pytest

from ast_data_pipeline_spark import lineage
from ast_data_pipeline_spark.registry import load_all


def _rows(spark, sf_dir, name):
    df = load_all()[name].fn(spark, sf_dir)
    return sorted(tuple(r) for r in df.collect())


def test_modes_identical_on_dedup_clusters(spark, sf_dir, tmp_path):
    assert not lineage.reliable_mode()
    local = _rows(spark, sf_dir, "x_dedup_clusters")
    os.environ["SPARK_GRAFT_CKPT_DIR"] = str(tmp_path / "ckpt")
    try:
        assert lineage.reliable_mode()
        reliable = _rows(spark, sf_dir, "x_dedup_clusters")
    finally:
        del os.environ["SPARK_GRAFT_CKPT_DIR"]
    assert local == reliable
    # the reliable run really went through the checkpoint dir
    ckpt_root = tmp_path / "ckpt"
    written = [p for p in ckpt_root.rglob("*") if p.is_file()]
    assert written, "reliable mode did not write any checkpoint files"


def test_lazy_cut_reliable_mode(spark, sf_dir, tmp_path):
    """Lazy cuts (eager=False) also honor the knob."""
    from pyspark.sql import functions as F

    os.environ["SPARK_GRAFT_CKPT_DIR"] = str(tmp_path / "ckpt2")
    try:
        df = spark.range(100).withColumn("v", F.col("id") * 2)
        cut = lineage.lineage_cut_lazy(df)
        assert cut.count() == 100
        assert cut.checkpoint is not None  # still a DataFrame
    finally:
        del os.environ["SPARK_GRAFT_CKPT_DIR"]
    assert [r.v for r in cut.orderBy("id").limit(3).collect()] == [0, 2, 4]
