"""The LSH bucket-occupancy guard (VERDICT r14 #5): curation must fail
fast, with a re-banding hint, when a band bucket goes quadratic — and
must be a pure pass-through on healthy corpora."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException  # noqa: F401 (doc import)

from ast_data_pipeline_spark.operators.dedup import (
    lsh_bands,
    minhash_signatures,
    occupancy_poison,
)


def _bands(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    shingled = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("shingle")
    )
    sig = minhash_signatures(shingled, 12)
    return lsh_bands(sig, 12, 3)


def test_guard_passthrough_on_healthy_buckets(spark):
    # token-disjoint docs -> singleton buckets; the poison branch must
    # contribute ZERO rows (candidate set unchanged)
    texts = [
        f"w{i}a w{i}b w{i}c w{i}d w{i}e w{i}f w{i}g w{i}h" for i in range(40)
    ]
    bands = _bands(spark, texts)
    assert occupancy_poison(bands, cap=10).count() == 0


def test_guard_raises_on_hot_bucket(spark):
    # 30 identical docs land every signature in the same bucket ->
    # occupancy 30 > cap 10 must abort with the re-banding hint
    texts = ["identical text payload for every document"] * 30
    poison = occupancy_poison(_bands(spark, texts), cap=10)
    with pytest.raises(Exception, match="occupancy breached cap"):
        poison.collect()


def test_curation_guard_is_wired_and_curate_still_runs(spark, sf_dir):
    # the pipeline passes the cap through; sf0.001 corpus is healthy so
    # curate() must execute clean end-to-end with the guard armed
    from ast_data_pipeline_spark.plans.curation import curate
    from ast_data_pipeline_spark.sources.catalog import load

    docs = load(spark, sf_dir, "documents")
    assert curate(spark, docs).count() > 0
