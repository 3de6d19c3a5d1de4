"""Winnowing guarantee (Schleimer et al. §4): two documents sharing a
run of at least win + k - 1 = 7 words must share at least one selected
fingerprint. Checked on the real Spark expressions."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ast_data_pipeline_spark.operators.text import gram_hashes, winnow_from_hashes

_WORDS = st.lists(
    st.sampled_from("alpha bravo charlie delta echo foxtrot golf hotel".split()),
    min_size=7,
    max_size=14,
)


def _select(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, t string")
    rows = (
        df.select("i", F.split(F.lower("t"), " ").alias("w"))
        .filter(F.size("w") >= 7)
        .select("i", gram_hashes("w").alias("hs"))
        .select("i", winnow_from_hashes("hs").alias("fps"))
        .collect()
    )
    return {r["i"]: set(r["fps"]) for r in rows}


@settings(max_examples=15, deadline=None)
@given(run=_WORDS, pre=_WORDS, post=_WORDS)
def test_shared_run_shares_a_fingerprint(spark, run, pre, post):
    # doc A = the run alone; doc B = the run embedded in other text
    a = " ".join(run)
    b = " ".join(pre + run + post)
    fps = _select(spark, [a, b])
    assert fps[0] & fps[1], (a, b)


def test_disjoint_vocab_shares_nothing(spark):
    fps = _select(
        spark,
        [
            "alpha bravo charlie delta echo foxtrot golf hotel india",
            "one two three four five six seven eight nine ten",
        ],
    )
    assert not (fps[0] & fps[1])
