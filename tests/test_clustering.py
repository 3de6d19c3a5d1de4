"""Lloyd k-means: convergence, monotone inertia, determinism, plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from ast_data_pipeline_spark.operators.clustering import (
    assign_to_centroids,
    inertia,
    kmeans_lloyd,
)
from ast_data_pipeline_spark.sources.catalog import load

K, DIM = 4, 64


def _emb(spark, sf_dir):
    return load(spark, sf_dir, "embeddings")


def test_assignment_is_valid_partition(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    assigned, cents, iters = kmeans_lloyd(emb, k=K, dim=DIM, max_iter=3)
    assert len(cents) == K and all(len(c) == DIM for c in cents)
    assert 1 <= iters <= 3
    n_in = emb.count()
    stats = assigned.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("cid").alias("lo"),
        F.max("cid").alias("hi"),
    ).collect()[0]
    assert stats["n"] == n_in  # every vector assigned exactly once
    assert 0 <= stats["lo"] and stats["hi"] < K


def test_inertia_monotone_nonincreasing(spark, sf_dir):
    """Each Lloyd step must not increase the loss (textbook invariant)."""
    emb = _emb(spark, sf_dir)
    seed = [list(r["embedding"]) for r in emb.orderBy("vec_id").limit(K).collect()]
    losses = []
    cents = seed
    for _ in range(4):
        assigned = assign_to_centroids(emb, cents)
        losses.append(inertia(assigned))
        rows = (
            assigned.groupBy("cid")
            .agg(*[F.avg(F.element_at("embedding", i + 1)).alias(f"m{i}") for i in range(DIM)])
            .collect()
        )
        nxt = [list(c) for c in cents]
        for r in rows:
            nxt[r["cid"]] = [r[f"m{i}"] for i in range(DIM)]
        cents = nxt
    for a, b in zip(losses, losses[1:]):
        assert b <= a + 1e-9, losses


def test_deterministic_given_seed(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    a1, c1, _ = kmeans_lloyd(emb, k=K, dim=DIM, max_iter=2)
    a2, c2, _ = kmeans_lloyd(emb, k=K, dim=DIM, max_iter=2)
    assert c1 == c2
    census = lambda a: sorted(  # noqa: E731
        (r["cid"], r["n"])
        for r in a.groupBy("cid").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    assert census(a1) == census(a2)


def test_assignment_plan_has_no_shuffle_or_python(spark, sf_dir):
    """Assignment must be a narrow JVM-only stage: literals, no exchange."""
    emb = _emb(spark, sf_dir)
    cents = [[0.0] * DIM, [1.0] * DIM]
    plan = assign_to_centroids(emb, cents)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_neardup_clusters_chain_and_clique(spark):
    # chain 1-2-3-4-5 needs several hash-min rounds (diameter 4);
    # clique 10-11-12 converges in one; pair 20-21 trivially
    from ast_data_pipeline_spark.operators.dedup import neardup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5),
         (10, 11), (10, 12), (11, 12),
         (20, 21)],
        "doc_a long, doc_b long",
    )
    out = {
        r.doc_id: (r.cluster_id, r.n_cluster_docs, r.is_canonical)
        for r in neardup_clusters(pairs).collect()
    }
    assert {d: c for d, (c, _, _) in out.items()} == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
    }
    assert all(n == 5 for d, (_, n, _) in out.items() if d <= 5)
    assert sorted(d for d, (_, _, canon) in out.items() if canon) == [1, 10, 20]


def test_star_cc_matches_hashmin_and_bounds_rounds(spark):
    # Equivalence on mixed topology + the O(log n) round bound on the
    # adversarial case: a 64-node chain (diameter 63) converges in a
    # handful of star rounds but CANNOT converge in 20 hash-min rounds
    # (VERDICT r4 #8 hardening).
    import pytest

    from ast_data_pipeline_spark.operators.dedup import (
        neardup_clusters,
        neardup_clusters_star,
    )

    mixed = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5),
         (10, 11), (10, 12), (11, 12),
         (20, 21), (30, 31), (31, 32), (30, 32), (32, 33)],
        "doc_a long, doc_b long",
    )
    key = lambda df: sorted(map(tuple, df.collect()))
    assert key(neardup_clusters_star(mixed)) == key(neardup_clusters(mixed))

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 163)], "doc_a long, doc_b long"
    )
    out = {r.doc_id: r.cluster_id for r in neardup_clusters_star(chain, max_iters=10).collect()}
    assert out == {i: 100 for i in range(100, 164)}
    with pytest.raises(RuntimeError, match="no fixpoint"):
        neardup_clusters(chain, max_iters=20)


def test_star_cc_matches_hashmin_on_random_graphs(spark):
    # Property check: on arbitrary random pair graphs the two CC
    # algorithms are interchangeable (same labels, sizes, canonicals).
    import random

    from ast_data_pipeline_spark.operators.dedup import (
        neardup_clusters,
        neardup_clusters_star,
    )

    rng = random.Random(5)
    for trial in range(4):
        n_nodes = rng.randint(5, 40)
        n_edges = rng.randint(1, 60)
        edges = [
            (rng.randrange(n_nodes), rng.randrange(n_nodes))
            for _ in range(n_edges)
        ]
        edges = [(a, b) for a, b in edges if a != b] or [(0, 1)]
        pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
        key = lambda df: sorted(map(tuple, df.collect()))
        assert key(neardup_clusters_star(pairs)) == key(
            neardup_clusters(pairs, max_iters=60)
        ), f"trial {trial}: {edges}"
