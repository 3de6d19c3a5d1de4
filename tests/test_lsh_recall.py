"""LSH recall against brute force (deterministic for the fixed corpus
and fixed md5 hash family): every pair with true Jaccard >= 0.7 must
be surfaced by the banded MinHash candidates. Measured recall at
sf0.001 is 1.0; the assertion allows one stray miss so a future
corpus regen doesn't hard-fail on probabilistic grounds."""

from __future__ import annotations

from ast_data_pipeline_spark.oracle import run_oracle_sql
from ast_data_pipeline_spark.registry import load_all

_BRUTE = """
WITH d AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, len(w) - 1),
                                      i -> w[i] || ' ' || w[i+1])) AS sh
  FROM (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents)
  WHERE len(w) >= 2
)
SELECT a.doc_id AS a, b.doc_id AS b
FROM d a JOIN d b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
      / len(list_distinct(list_concat(a.sh, b.sh)))::DOUBLE >= 0.7
"""


def test_minhash_recall_on_high_jaccard(spark, sf_dir):
    truth = {
        (r.a, r.b) for r in run_oracle_sql(_BRUTE, sf_dir).itertuples()
    }
    lsh = load_all()["x_minhash_lsh_neardup"].fn(spark, sf_dir).toPandas()
    found = {(r.doc_a, r.doc_b) for r in lsh.itertuples()}
    assert len(truth) > 0
    missed = truth - found
    assert len(missed) <= 1, f"LSH missed high-jaccard pairs: {sorted(missed)[:5]}"


def test_multiprobe_lifts_recall_over_single_table(spark, sf_dir):
    specs = load_all()
    single = specs["x_ann_recall_eval"].fn(spark, sf_dir).toPandas()
    multi = specs["x_ann_recall_multiprobe"].fn(spark, sf_dir).toPandas()
    # same truth set, paired per query
    assert sorted(single.q_id) == sorted(multi.q_id)
    # Hamming-1 probing can only widen the candidate pool
    s = single.set_index("q_id")
    m = multi.set_index("q_id")
    assert (m.n_retrieved >= s.n_retrieved).all()
    assert (m.n_hits >= s.n_hits).all()
    # and on these embeddings it measurably lifts recall@3
    assert m.recall.mean() > s.recall.mean()


def test_prefix_filter_join_is_exact(spark, sf_dir):
    # prefix filtering is EXACT: the verified pair set must equal the
    # quadratic brute-force truth at the same threshold — no misses
    # (the prefix theorem) and no extras (the verify step)
    truth = {
        (r.a, r.b) for r in run_oracle_sql(_BRUTE, sf_dir).itertuples()
    }
    got = load_all()["x_prefix_filter_join"].fn(spark, sf_dir).toPandas()
    found = {(r.doc_a, r.doc_b) for r in got.itertuples()}
    assert found == truth


def test_semantic_dedup_bucket_no_loss(sf_dir):
    # The x_semantic_dedup oracle mirrors the Spark plan's (cid, LSH
    # bucket) candidate routing structurally (ADVICE r6), so the hash
    # gate can no longer catch a routing recall loss by construction.
    # This pins the no-loss property it used to prove incidentally:
    # every within-cluster cosine>=T pair must also collide in the
    # rh-LSH bucket (true for the planted twins: a relative per-dim
    # perturbation of ~1e-3 cannot flip a hyperplane sign unless the
    # projection is degenerate on this corpus — verified here).
    from ast_data_pipeline_spark.queries.similarity import (
        _ND_CORPUS_SQL,
        _SEMDEDUP_ORACLE,  # noqa: F401  (import proves it still builds)
        EMB_DIM,
        K_CENTROIDS,
        LSH_PLANES,
        NEARDUP_T,
    )
    from ast_data_pipeline_spark.operators.similarity import (
        dot_sql,
        norm_sql,
        rh_lsh_bucket_sql,
    )

    sql = f"""
WITH {_ND_CORPUS_SQL},
cents AS (
  SELECT vec_id AS cid, emb AS cvec FROM base WHERE vec_id < {K_CENTROIDS}
),
assigned AS (
  SELECT vec_id, emb, cid,
         {rh_lsh_bucket_sql('emb', LSH_PLANES, EMB_DIM)} AS bucket
  FROM (
    SELECT e.vec_id, e.emb, c.cid,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY
             {dot_sql('e.emb', 'c.cvec')}
               / ({norm_sql('e.emb')} * {norm_sql('c.cvec')}) DESC, c.cid) AS rn
    FROM corpus e CROSS JOIN cents c
  ) WHERE rn = 1
),
brute AS (
  SELECT a.vec_id AS va, b.vec_id AS vb,
         (a.bucket = b.bucket)::INT AS collided
  FROM assigned a JOIN assigned b
    ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE {dot_sql('a.emb', 'b.emb')}
          / ({norm_sql('a.emb')} * {norm_sql('b.emb')}) >= {NEARDUP_T}
)
SELECT count(*)::BIGINT AS n_pairs, sum(collided)::BIGINT AS n_collided
FROM brute
"""
    res = run_oracle_sql(sql, sf_dir)
    n_pairs = int(res.n_pairs.iloc[0])
    n_collided = int(res.n_collided.iloc[0] or 0)
    assert n_pairs > 0, "corpus lost its planted twins"
    assert n_collided == n_pairs, (
        f"bucket routing lost {n_pairs - n_collided}/{n_pairs} "
        "within-cluster near-dup pairs"
    )


def test_substring_dedup_census_matches_brute_force(spark, sf_dir):
    # Independent (non-mirrored) recompute of the removal census: both
    # engines share the windowed interval-merge formula, so the oracle
    # gate alone can't catch a shared semantic bug (the r6 quantile
    # lesson). Here the union length is recomputed brute-force with
    # Python sets of covered word positions.
    from ast_data_pipeline_spark.registry import load_all

    K = 8
    got = load_all()["x_substring_dedup_census"].fn(spark, sf_dir).toPandas()
    docs = run_oracle_sql("SELECT doc_id, source, text FROM documents", sf_dir)
    spans = {}  # span -> list[(doc_id, pos)]
    words = {}
    for r in docs.itertuples():
        ws = [w for w in r.text.split() if w]
        words[r.doc_id] = (r.source, len(ws))
        for i in range(len(ws) - K + 1):
            spans.setdefault(" ".join(ws[i : i + K]), []).append((r.doc_id, i + 1))
    covered: dict[int, set[int]] = {}
    for occs in spans.values():
        if len({d for d, _ in occs}) < 2:
            continue
        for d, i in sorted(occs)[1:]:  # canonical (first) kept
            covered.setdefault(d, set()).update(range(i, i + K))
    agg: dict[str, list[int]] = {}
    for doc_id, (source, n_words) in words.items():
        # docs, affected, words, removed, intervals
        a = agg.setdefault(source, [0, 0, 0, 0, 0])
        a[0] += 1
        a[2] += n_words
        if doc_id in covered:
            a[1] += 1
            a[3] += len(covered[doc_id])
            # Count contiguous covered-position runs independently of
            # the windowed gaps-and-islands formula both engines share
            # (ADVICE r7: the island count was the one column the
            # oracle gate could not independently confirm).
            pos = sorted(covered[doc_id])
            a[4] += 1 + sum(
                1 for p, q in zip(pos, pos[1:]) if q != p + 1
            )
    assert len(got) == len(agg)
    for r in got.itertuples():
        e = agg[r.source]
        assert (
            r.n_docs,
            r.n_docs_affected,
            r.total_words,
            r.removed_words,
            r.n_removal_intervals,
        ) == tuple(e), r.source


def test_pq_adc_recall_high_on_clustered_corpus(spark, tmp_path):
    """Honesty pin for x_pq_adc_recall: 0.11 on the uniform synthetic
    corpus is the honest number for 4-bit product quantization (random
    baseline ~0.006), and the METHOD must excel when neighborhood
    structure is quantization-compatible. Clusters of size 4 make the
    true top-3 exactly the query's cluster mates, which PQ retrieves
    perfectly (same code -> ADC 0). NOTE the deliberate design: with
    BIG tight clusters (50 points), recall@3 collapses even though PQ
    identifies the right cluster — every mate shares the code, ADC
    cannot rank inside it; that is why production PQ re-ranks with
    exact distances. A numpy replica of the pipeline confirms
    recall 1.0 on this fixture."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ast_data_pipeline_spark.registry import load_all

    rng = np.random.default_rng(11)
    centers = rng.normal(0, 10, (125, 64)).astype(np.float32)
    vecs = np.repeat(centers, 4, axis=0) + rng.normal(
        0, 0.01, (500, 64)
    ).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(500), pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array([i // 4 for i in range(500)], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    out = load_all()["x_pq_adc_recall"].fn(spark, str(tmp_path)).collect()
    assert out, "no query rows"
    mean_recall = sum(r.recall_at_3 for r in out) / len(out)
    assert mean_recall >= 0.9, f"PQ recall on clustered corpus: {mean_recall}"


def test_ivfpq_perfect_recall_tiny_scan_on_clustered_corpus(spark, tmp_path):
    """IVF-PQ honesty pin on the same 125x4 clustered fixture: the
    label IS the cluster, so probing 2 of 125 cells must find all 3
    cluster mates (recall 1.0) while scanning ~2*4/499 = 1.6% of the
    corpus — the whole point of the IVF-PQ composition, visible in
    one row. (On the uniform synthetic corpus the registered query
    honestly reports ~0.17 recall at ~20% scan: random cells bound
    recall by scan fraction.)"""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ast_data_pipeline_spark.registry import load_all

    rng = np.random.default_rng(11)
    centers = rng.normal(0, 10, (125, 64)).astype(np.float32)
    vecs = np.repeat(centers, 4, axis=0) + rng.normal(
        0, 0.01, (500, 64)
    ).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(500), pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array([i // 4 for i in range(500)], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    out = load_all()["x_ivfpq_recall"].fn(spark, str(tmp_path)).collect()
    assert out
    mean_recall = sum(r.recall_at_3 for r in out) / len(out)
    max_scan = max(r.scan_fraction for r in out)
    assert mean_recall == 1.0, f"IVF-PQ recall on clustered corpus: {mean_recall}"
    assert max_scan < 0.05, f"IVF-PQ scanned too much: {max_scan}"


def test_ivfpq_rerank_lifts_adc_recall(spark, tmp_path):
    """Honesty pin for x_ivfpq_rerank (the ADC+R refinement): on 50
    clusters of 10 points with sigma=0.5 noise, the probed cells
    contain every true neighbor and the top-C ADC shortlist keeps
    them — but 4-bit residual codes misrank WITHIN the cluster, so
    the unreranked ADC top-3 reads 0.611 while exact re-ranking of
    the same 10-candidate shortlist restores recall 1.0 at a 2%
    exact-distance fraction. The pipeline is deterministic on a fixed
    fixture, so the values are pinned tight. (On the uniform sf0.01
    corpus the registered query honestly reports 0.278 reranked vs
    0.167 unreranked — cell pruning, not ADC ranking, binds there.)"""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ast_data_pipeline_spark.registry import load_all

    rng = np.random.default_rng(11)
    centers = rng.normal(0, 10, (50, 64)).astype(np.float32)
    vecs = np.repeat(centers, 10, axis=0) + rng.normal(
        0, 0.5, (500, 64)
    ).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(500), pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array([i // 10 for i in range(500)], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    out = load_all()["x_ivfpq_rerank"].fn(spark, str(tmp_path)).toPandas()
    assert len(out) > 0
    rerank = out.recall_at_3.mean()
    adc = out.n_hits_adc.mean() / 3
    assert rerank == 1.0, f"reranked recall {rerank}"
    assert adc <= 0.8, f"ADC recall unexpectedly high ({adc}) — fixture no longer exercises the rerank"
    assert rerank > adc + 0.2, f"no lift: rerank {rerank} vs adc {adc}"
    assert (out.rerank_fraction <= 10 / 499 + 1e-12).all()


def test_ivfpq_rerank_sweep_frontier(spark, tmp_path):
    """The rerank-sweep frontier on the 50x10 sigma=0.5 fixture: recall
    must be non-decreasing in C (a larger shortlist can only add
    candidates to the exact re-rank) and reach 1.0 once C covers the
    cluster (C=10 equals x_ivfpq_rerank's pinned 1.0); C=3 — exact
    re-scoring of ADC's own top-3 — cannot beat ADC's ordering and so
    stays at the degraded ADC level. n_reranked must grow exactly
    linearly in C (every query has >= 20 candidates here)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ast_data_pipeline_spark.registry import load_all

    rng = np.random.default_rng(11)
    centers = rng.normal(0, 10, (50, 64)).astype(np.float32)
    vecs = np.repeat(centers, 10, axis=0) + rng.normal(
        0, 0.5, (500, 64)
    ).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(500), pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array([i // 10 for i in range(500)], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    out = (
        load_all()["x_ivfpq_rerank_sweep"].fn(spark, str(tmp_path))
        .toPandas()
        .sort_values("c")
    )
    rec = out.recall_at_3.to_numpy()
    assert (np.diff(rec) >= -1e-12).all(), f"frontier not monotone: {rec}"
    assert rec[-1] == 1.0 and out.iloc[-1].c == 20
    assert out.set_index("c").recall_at_3[10] == 1.0  # matches x_ivfpq_rerank's pin
    assert rec[0] < 0.8  # C=3 is ADC-order rescoring, still degraded
    nq = int(out.n_queries.iloc[0])
    # every query has exactly 19 probed candidates here (9 cluster
    # mates + 10 in the second-nearest cell), so n_reranked is C*nq
    # up to the candidate ceiling and min(19, C)*nq past it
    expect = out.c.clip(upper=19) * nq
    assert (out.n_reranked == expect).all(), (
        out.n_reranked.tolist(), expect.tolist(),
    )


def test_lsh_bucket_stats_recompute_from_bands(spark, sf_dir):
    # Independent twin for x_lsh_bucket_stats (family-pytest practice):
    # pull the raw band frame to pandas and recompute every output
    # column with numpy groupbys — the query's groupBy chain must
    # match, and candidate_pairs must also equal the NON-distinct
    # band-join pair count (sum of C(s,2) IS the per-band join output
    # by definition, so a drift between the stats query and the real
    # candidate generator would surface here).
    import pandas as pd
    from pyspark.sql import functions as F

    from ast_data_pipeline_spark.operators.dedup import (
        lsh_bands,
        minhash_signatures,
        word_shingles,
        words_col,
    )
    from ast_data_pipeline_spark.queries.dedup import NUM_HASHES, ROWS_PER_BAND
    from ast_data_pipeline_spark.registry import load_all
    from ast_data_pipeline_spark.sources.catalog import load

    got = (
        load_all()["x_lsh_bucket_stats"].fn(spark, sf_dir)
        .toPandas()
        .sort_values("band_id")
        .reset_index(drop=True)
    )
    docs = load(spark, sf_dir, "documents").withColumn("w", words_col(F.col("text")))
    docsets = docs.filter(F.size("w") >= 2).select("doc_id", word_shingles("w", 2))
    sig = minhash_signatures(
        docsets.select("doc_id", F.explode("shingles").alias("shingle")), NUM_HASHES
    )
    bands = lsh_bands(sig, NUM_HASHES, ROWS_PER_BAND).toPandas()
    occ = bands.groupby(["band_id", "band_val"]).size().rename("s").reset_index()
    exp = (
        occ.groupby("band_id")
        .agg(
            n_buckets=("s", "size"),
            max_bucket=("s", "max"),
            candidate_pairs=("s", lambda s: int((s * (s - 1) // 2).sum())),
            pairs_from_hot_buckets=(
                "s", lambda s: int((s[s > 100] * (s[s > 100] - 1) // 2).sum())
            ),
        )
        .reset_index()
    )
    pd.testing.assert_frame_equal(
        got.astype("int64"), exp.astype("int64"), check_names=False
    )
