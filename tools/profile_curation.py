#!/usr/bin/env python
"""Stage-level profile of x_curation_pipeline (VERDICT r12 #3).

The curation pipeline grew 30x for 10x data at sf1 (0.63 s sf0.1 ->
19.1 s sf1) and nobody had attributed WHICH stage eats it. This tool
times each stage in isolation (forcing materialization with a noop
write / count) and — the part timing can't show — counts the LSH
band-collision CANDIDATE pairs before the Jaccard verify, the term
suspected of growing superlinearly with corpus density at
rows_per_band=2.

Usage::

    python tools/profile_curation.py /root/testdata/sf0.1
    python tools/profile_curation.py /tmp/ast_sf1

Prints one JSON line per stage: {"stage", "sec", "rows"} plus a
summary; paste the numbers into SCALING.md's curation subsection.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def timed(tag, df, count=False):
    t0 = time.perf_counter()
    if count:
        n = df.count()
    else:
        df.write.format("noop").mode("overwrite").save()
        n = None
    sec = time.perf_counter() - t0
    print(json.dumps({"stage": tag, "sec": round(sec, 3), "rows": n}), flush=True)
    return n


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ast_data_pipeline_spark.lineage import lineage_cut_lazy
    from ast_data_pipeline_spark.operators.dedup import (
        candidate_pairs,
        jaccard_verify,
        lsh_bands,
        minhash_signatures,
        word_shingles,
        words_col,
    )
    from ast_data_pipeline_spark.plans import curation as C
    from ast_data_pipeline_spark.session import get_spark
    from ast_data_pipeline_spark.sources.catalog import load

    spark = get_spark("curation-profile")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm JIT

    docs = load(spark, sf_dir, "documents")

    # stage 1+2: quality gate + exact dedup (everything before minhash)
    d = docs.withColumn("w", words_col(F.col("text")))
    n_tok = F.size("w").cast("long")
    from ast_data_pipeline_spark.operators.text import (
        EN_STOPWORDS,
        hit_ratio,
        punct_ratio,
    )

    stop = hit_ratio("w", EN_STOPWORDS)
    punct = punct_ratio(F.col("text"))
    length_ok = F.when((n_tok >= 20) & (n_tok <= 400), F.lit(1.0)).otherwise(F.lit(0.0))
    quality = (
        length_ok * 0.4
        + F.least(stop * 2.0, F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(punct * 10.0, F.lit(1.0))) * 0.2
    )
    scored = d.withColumn("quality_score", quality).withColumn("n_tokens", n_tok)
    q = scored.filter(F.col("quality_score") >= C.QUALITY_MIN)
    wk = Window.partitionBy(F.md5(F.lower("text"))).orderBy("doc_id")
    exact = (
        q.withColumn("rn", F.row_number().over(wk)).filter(F.col("rn") == 1).drop("rn")
    )
    exact = exact.select(
        "doc_id", "lang", "source", "quality_score", "n_tokens", "w"
    ).transform(lineage_cut_lazy)
    timed("quality+exact_dedup", exact, count=True)

    # stage 3a: shingle + minhash signatures
    docsets = exact.filter(F.size("w") >= 2).select(
        "doc_id", word_shingles("w", 2)
    )
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    docsets = docsets.repartition(n_part, "doc_id").transform(lineage_cut_lazy)
    exploded = docsets.select("doc_id", F.explode("shingles").alias("shingle"))
    sig = minhash_signatures(exploded, C.NUM_HASHES, "doc_id").transform(
        lineage_cut_lazy
    )
    timed("minhash_signatures", sig, count=True)

    # stage 3b: band-collision candidates — THE suspected superlinear term
    cand = candidate_pairs(
        lsh_bands(sig, C.NUM_HASHES, C.ROWS_PER_BAND, "doc_id"), "doc_id"
    ).transform(lineage_cut_lazy)
    n_cand = timed("lsh_candidate_pairs", cand, count=True)

    # band-bucket size distribution: sum C(size,2) per bucket is the
    # join's output; the tail buckets are where quadratic cost lives
    bands = lsh_bands(sig, C.NUM_HASHES, C.ROWS_PER_BAND, "doc_id")
    dist = (
        bands.groupBy("band_id", "band_val").count()
        .agg(
            F.count("*").alias("n_buckets"),
            F.max("count").alias("max_bucket"),
            F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("sum_pairs"),
            F.sum(F.when(F.col("count") > 100, F.col("count") * (F.col("count") - 1) / 2)
                  .otherwise(0)).alias("pairs_from_buckets_gt100"),
        )
        .collect()[0]
    )
    print(json.dumps({"stage": "bucket_distribution", **dist.asDict()},
                     default=float), flush=True)

    # stage 3c: exact-Jaccard verify over the candidates
    ver = jaccard_verify(cand, docsets, C.JACCARD_T, "doc_id", "shingles")
    timed("jaccard_verify", ver, count=True)

    # whole pipeline, as benched
    t0 = time.perf_counter()
    kept = C.curate(spark, docs)
    kept.write.format("noop").mode("overwrite").save()
    print(json.dumps({"stage": "end_to_end", "sec": round(time.perf_counter() - t0, 3),
                      "n_candidates": n_cand}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
