"""Mergeability proofs for the deterministic sketches: a sketch built
from unioned shard sketches must equal the sketch built in one pass —
the property that lets 1000 executors build them independently."""

from __future__ import annotations

from pyspark.sql import functions as F

from ast_data_pipeline_spark.queries.aggregates import CMS_DEPTH, CMS_WIDTH, KMV_K
from ast_data_pipeline_spark.sources.catalog import load


def _bigrams(docs):
    return (
        docs.select("source", F.split(F.lower("text"), " ").alias("a"))
        .select(
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(2, size(a)), i -> "
                    "struct(a[i - 2] AS w1, a[i - 1] AS w2))"
                )
            ).alias("p"),
        )
        .filter((F.col("p.w1") != "") & (F.col("p.w2") != ""))
        .select("source", F.concat_ws(" ", "p.w1", "p.w2").alias("tok"))
    )


def test_kmv_sketch_merges_across_shards(spark, sf_dir):
    # per-shard KMV = k smallest distinct hashes; union of shard
    # sketches -> k smallest == single-pass sketch (so the k-th value,
    # hence the estimate, is identical)
    docs = load(spark, sf_dir, "documents")
    h = (
        _bigrams(docs)
        .distinct()
        .withColumn(
            "hv",
            F.expr("cast(conv(substring(md5(tok), 1, 12), 16, 10) as bigint)"),
        )
    )
    full = [
        r.hv
        for r in h.select("hv").distinct().orderBy("hv").limit(KMV_K).collect()
    ]
    shard_sketches = []
    for s in range(4):
        shard = h.filter(F.crc32(F.col("tok")) % 4 == s)
        shard_sketches.extend(
            r.hv
            for r in shard.select("hv").distinct().orderBy("hv").limit(KMV_K).collect()
        )
    merged = sorted(set(shard_sketches))[:KMV_K]
    assert merged == full


def test_cms_cells_merge_cellwise(spark, sf_dir):
    # CMS built on each half of the corpus, added cell-wise, equals
    # the CMS built on the whole corpus
    docs = load(spark, sf_dir, "documents")

    def cms(d):
        counted = _bigrams(d).groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
        return (
            counted.select(
                "tok",
                "n",
                F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("r"),
            )
            .withColumn(
                "col",
                F.expr(
                    "cast(conv(substring(md5(concat(cast(r as string), '|', tok)),"
                    f" 1, 6), 16, 10) as bigint) % {CMS_WIDTH}"
                ),
            )
            .groupBy("r", "col")
            .agg(F.sum("n").alias("cell"))
        )

    full = {(r.r, r.col): r.cell for r in cms(docs).collect()}
    lo = cms(docs.filter(F.col("doc_id") % 2 == 0))
    hi = cms(docs.filter(F.col("doc_id") % 2 == 1))
    merged: dict = {}
    for r in lo.collect() + hi.collect():
        merged[(r.r, r.col)] = merged.get((r.r, r.col), 0) + r.cell
    assert merged == full


def test_table_checksum_detects_any_mutation(spark, sf_dir):
    # the anti-entropy claim, concretely: change one row, drop one
    # row, or duplicate one row and the xor-of-row-hashes must move
    import pyspark.sql.functions as F

    from ast_data_pipeline_spark.sources.catalog import load

    def checksum(df):
        return df.agg(
            F.expr(
                "bit_xor(cast(conv(substring(md5(concat_ws('|', "
                "cast(c_custkey as string), c_name, c_mktsegment, "
                "cast(c_nationkey as string))), 1, 15), 16, 10) as bigint))"
            ).alias("h")
        ).collect()[0]["h"]

    cust = load(spark, sf_dir, "customer")
    base = checksum(cust)
    mutated = cust.withColumn(
        "c_name",
        F.when(F.col("c_custkey") == 0, F.lit("Customer#MUTATED")).otherwise(
            F.col("c_name")
        ),
    )
    dropped = cust.filter(F.col("c_custkey") != 0)
    duped = cust.unionByName(cust.filter(F.col("c_custkey") == 0))
    assert checksum(mutated) != base
    assert checksum(dropped) != base
    assert checksum(duped) != base  # xor of a dup row cancels ITS hash only
    # reordering/partitioning must NOT move it
    assert checksum(cust.repartition(7)) == base


def test_hll_registers_merge_max(spark, sf_dir):
    """HLL's whole 1000-executor story is that registers MAX-merge:
    union of shard sketches == the sketch of the union. Shard the
    hashed tokens two ways (by doc parity via md5 of tok — any
    partition works), build registers per shard, element-wise MAX the
    shard registers, and pin byte-equality with the full-corpus
    registers AND the identical final estimate (KMV/CMS have the same
    pin; HLL was the one missing it)."""
    from pyspark.sql import functions as F

    from ast_data_pipeline_spark.queries.aggregates import (
        hll_estimate,
        hll_registers,
        hll_tokens,
    )
    from ast_data_pipeline_spark.sources.catalog import load

    docs = load(spark, sf_dir, "documents")
    h = hll_tokens(docs)
    full = {
        (r.source, r.bucket): r.m_reg
        for r in hll_registers(h).collect()
    }
    shard_a = hll_registers(h.filter(F.col("hv") % 2 == 0))
    shard_b = hll_registers(h.filter(F.col("hv") % 2 == 1))
    merged: dict = {}
    for shard in (shard_a, shard_b):
        for r in shard.collect():
            k = (r.source, r.bucket)
            merged[k] = max(merged.get(k, 0), r.m_reg)
    assert merged == full
    # and the merged registers finalize to the identical estimate
    mdf = spark.createDataFrame(
        [(s, b, m) for (s, b), m in sorted(merged.items())],
        "source string, bucket long, m_reg int",
    )
    est_merged = {
        r.source: r.hll_est for r in hll_estimate(mdf).collect()
    }
    est_full = {
        r.source: r.hll_est for r in hll_estimate(hll_registers(h)).collect()
    }
    assert est_merged == est_full
