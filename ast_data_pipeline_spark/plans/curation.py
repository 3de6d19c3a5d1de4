"""Training-data curation pipeline — the extension-side flagship.

The standard pre-training curation pass, composed from the engine's
own operators, all declarative:

  1. quality filter   (text.py heuristics, Gopher/C4-style)
  2. exact dedup      (md5 groupBy, keep min doc_id)
  3. near-dup drop    (MinHash+LSH candidates -> exact-Jaccard verify;
                       greedy keep-lowest-id within each dup pair)

Output: the kept documents with their quality scores plus a stage-by-
stage attrition ledger. Every stage is shuffle-bounded (hash, band
join) — nothing quadratic, nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ast_data_pipeline_spark.lineage import lineage_cut_lazy

from ..operators.dedup import (
    minhash_neardup_compact,
    word_shingles,
    words_col,
)
from ..operators.text import EN_STOPWORDS, hit_ratio, punct_ratio

QUALITY_MIN = 0.5
NUM_HASHES = 12
# 4 bands of 3 (r13; was 6 bands of 2). Two reasons, one measured and
# one structural:
# - VERDICT r12 #3's sf1 profile (tools/profile_curation.py): with
#   r=2 the band-collision candidates grew 64k -> 6.48M for 10x docs
#   (quadratic — background bigram-Jaccard collides on 2-row bands;
#   max bucket 571, 3.1M pairs from buckets >100) and the exact-
#   Jaccard verify over them ate 48 s of the 19 s+ sf1 runtime while
#   finding the same 208 true pairs. queries/dedup.py hit the
#   identical wall in r8 and moved to r=3; this site missed it.
# - The DuckDB oracle (_curation_ctes in queries/dedup.py) builds its
#   bands from THAT module's ROWS_PER_BAND = 3, so the Spark plan and
#   its oracle were banding differently and agreed only because the
#   verified-loser sets coincide on this corpus. Aligning removes the
#   latent divergence: same bands, same candidates, same losers by
#   construction.
# Detection probability at the JACCARD_T=0.5 verify floor drops
# (0.82 -> 0.41 for a borderline J=0.5 pair), but the planted
# near-dups sit at J~0.8-1.0 where 4x3 banding detects ~0.94-1.0 —
# kept-set parity verified at sf0.01/sf0.1/sf1 after the change.
ROWS_PER_BAND = 3
JACCARD_T = 0.5
# Quadratic-blowup guard (VERDICT r14 #5): any band bucket holding more
# docs than this aborts the run with a re-banding hint BEFORE the
# candidate self-join pays s^2 for it (the r13 profile's 571-doc
# buckets produced 3.1M junk pairs; 10k docs in one bucket would be
# ~50M pairs — clearly a banding config failure, not data). The guard
# shares the self-join's exchange, so healthy corpora pay one window
# count per band row and no extra shuffle (operators/dedup.
# guard_bucket_occupancy; synthetic hot-bucket pytest in
# tests/test_curation_guard.py).
MAX_BUCKET_OCCUPANCY = 10_000


def curate(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Returns kept docs: doc_id, lang, source, quality_score, n_tokens."""
    d = docs.withColumn("w", words_col(F.col("text")))
    n_tok = F.size("w").cast("long")
    stop = hit_ratio("w", EN_STOPWORDS)
    punct = punct_ratio(F.col("text"))
    length_ok = F.when((n_tok >= 20) & (n_tok <= 400), F.lit(1.0)).otherwise(F.lit(0.0))
    quality = (
        length_ok * 0.4
        + F.least(stop * 2.0, F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(punct * 10.0, F.lit(1.0))) * 0.2
    )
    scored = d.withColumn("quality_score", quality).withColumn("n_tokens", n_tok)

    # 1. quality gate
    q = scored.filter(F.col("quality_score") >= QUALITY_MIN)

    # 2. exact dedup: keep min doc_id per content hash
    wk = Window.partitionBy(F.md5(F.lower("text"))).orderBy("doc_id")
    exact = q.withColumn("rn", F.row_number().over(wk)).filter(F.col("rn") == 1).drop("rn")
    # exact feeds BOTH the minhash branch and the final anti-join; without
    # a checkpoint the regex-heavy scoring lineage runs twice. Project
    # away `text` (the widest column — shingling reads pre-split `w`)
    # before materializing so the cached partitions stay narrow.
    exact = exact.select(
        "doc_id", "lang", "source", "quality_score", "n_tokens", "w"
    ).transform(lineage_cut_lazy)

    # 3. near-dup drop (greedy keep-lowest within verified pairs)
    docsets = exact.filter(F.size("w") >= 2).select(
        "doc_id", word_shingles("w", 2)
    )
    pairs = minhash_neardup_compact(
        docsets, NUM_HASHES, ROWS_PER_BAND, JACCARD_T,
        max_bucket_occupancy=MAX_BUCKET_OCCUPANCY,
    )
    losers = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    # r14: broadcast the loser set. Both anti-join inputs sit behind
    # localCheckpoint cuts (ExistingRDD, no size stats), so Catalyst
    # fell back to a SortMergeJoin that shuffled+sorted BOTH sides
    # (plans/r14/x_curation_pipeline_before.txt: Exchange(3)+Sort on
    # 5k kept docs, Exchange+Sort on the losers). The loser side is the
    # verified near-dup set — a few hundred doc_ids (~0.2% of the
    # corpus by the banding design) — the textbook broadcast-anti case
    # (guide §3.1). At 100 TB losers stay O(dup-rate x corpus) keys,
    # 8 B each; if a corpus ever breaks the broadcast cap the hint
    # degrades to the pre-r14 SMJ, losing nothing.
    kept = exact.join(F.broadcast(losers), "doc_id", "left_anti")
    return kept.select("doc_id", "lang", "source", "quality_score", "n_tokens")


def curation_report(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Attrition ledger: rows surviving each stage."""
    kept = curate(spark, docs)
    n_total = docs.count()
    n_kept = kept.count()
    return spark.createDataFrame(
        [("input", n_total), ("kept", n_kept), ("dropped", n_total - n_kept)],
        "stage string, n long",
    )
