"""Similarity search over embedding columns (north-star extension).

Cosine arithmetic runs element-wise in doubles (bit-identical in any
engine) with the reduction as a sequential left fold in a fixed
order, so scores — not just rankings — reproduce across engines and
partitionings.

Scale paths:
- brute-force top-k: queries broadcast, one pass over the corpus —
  the correct baseline when queries are few.
- IVF-style bucketed top-k: restrict the search to the query's
  cluster (here: the precomputed ``label`` column as the coarse
  assignment) — the corpus side shuffles once on the bucket key.
- near-dup pairs: all-pairs within a bucket; at scale this composes
  with LSH banding exactly like the text near-dup path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# dot product as a sequential left fold over per-element double
# products. Both Spark's ``aggregate`` and DuckDB's ``list_reduce``
# fold left-to-right, so the summation order — and therefore every
# bit of the result — is identical across engines. (Decimal casting
# is NOT usable here: Spark's double->decimal goes through the
# shortest string repr, which rounds differently than DuckDB's exact
# binary expansion.)
_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> "
    "cast(x as double) * cast(y as double)), "
    "cast(0 as double), (acc, v) -> acc + v)"
)


def dot(a: str, b: str) -> Column:
    return F.expr(_DOT.format(a=a, b=b))


def norm(a: str) -> Column:
    return F.sqrt(F.expr(_DOT.format(a=a, b=a)))


_L2SQ = (
    "aggregate(zip_with({a}, {b}, (x, y) -> "
    "(cast(x as double) - cast(y as double)) * "
    "(cast(x as double) - cast(y as double))), "
    "cast(0 as double), (acc, v) -> acc + v)"
)


def l2sq(a: str, b: str) -> Column:
    """Squared L2 distance between two array columns as the SAME
    sequential left fold as ``dot`` (aggregate ↔ list_reduce — the
    cross-engine exactness convention for array reductions)."""
    return F.expr(_L2SQ.format(a=a, b=b))


def l2sq_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(generate_series(1, len({a})), i -> "
        f"(({a}[i]::DOUBLE) - ({b}[i]::DOUBLE)) * "
        f"(({a}[i]::DOUBLE) - ({b}[i]::DOUBLE)))), (acc, v) -> acc + v)"
    )


def dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(generate_series(1, len({a})), i -> "
        f"({a}[i]::DOUBLE) * ({b}[i]::DOUBLE))), (acc, v) -> acc + v)"
    )


def norm_sql(a: str) -> str:
    return f"sqrt({dot_sql(a, a)})"


def _plane_coeff(p: int, i: int) -> int:
    """Hyperplane coefficient for (plane, coord): the SAME value as the
    SQL form ``(conv(substring(md5('p|i'),1,6),16,10) % 2001) - 1000``
    (md5 of an ASCII literal, first 24 bits, remainder of a
    non-negative value — engine-independent), computed once in Python.
    """
    import hashlib

    return int(hashlib.md5(f"{p}|{i}".encode()).hexdigest()[:6], 16) % 2001 - 1000


def rh_lsh_bucket(vec_col: str, n_planes: int, dim: int) -> Column:
    """Random-hyperplane LSH bucket id (sign pattern over ``n_planes``
    deterministic pseudo-random hyperplanes).

    Plane coefficients derive from md5 of (plane, coord) — identical in
    any engine, no RNG state to ship. Cosine-similar vectors land in
    the same bucket with probability (1 - theta/pi)^n_planes.

    r14: the coefficients are evaluated to integer literals in Python
    (``_plane_coeff``) instead of embedding 6x64 foldable
    md5/conv/substring subtrees per call site. Values are identical
    (pinned by tests/test_lsh_recall.py's oracle hash and a direct
    equality test in tests/test_similarity_lsh_literal.py), but the
    expression tree shrinks ~8x: parse+optimize no longer folds 384
    md5 calls per plan (and the multiprobe plans instantiate this
    expression several times), and first-call codegen compile drops
    accordingly — measured 2.29 s -> 0.49 s cold / 0.50 -> 0.38 s warm
    for the bucket projection alone at sf0.1 (guide §1.2 "per-task
    work", §7.2 plan size).
    """
    bits = []
    for p in range(n_planes):
        coeffs = " + ".join(
            f"{_plane_coeff(p, i)} * cast({vec_col}[{i}] as double)"
            for i in range(dim)
        )
        bits.append(f"(case when ({coeffs}) >= 0 then {2**p} else 0 end)")
    return F.expr("cast(" + " + ".join(bits) + " as int)")


def rh_lsh_bucket_sql(vec_col: str, n_planes: int, dim: int) -> str:
    bits = []
    for p in range(n_planes):
        coeffs = " + ".join(
            f"((('0x' || substr(md5('{p}|{i}'), 1, 6))::BIGINT % 2001) - 1000)"
            f" * ({vec_col}[{i + 1}]::DOUBLE)"
            for i in range(dim)
        )
        bits.append(f"(CASE WHEN ({coeffs}) >= 0 THEN {2**p} ELSE 0 END)")
    return "(" + " + ".join(bits) + ")::INT"


def cosine_topk(
    queries: DataFrame, corpus: DataFrame, k: int, bucket: str | None = None
) -> DataFrame:
    """Top-k cosine neighbors per query (excluding self).

    ``queries``: (q_id, q_vec [, bucket]); ``corpus``: (vec_id,
    embedding [, bucket]). Queries are broadcast — the corpus is
    scanned once, ranked per query via a window.
    """
    cond = F.col("q_id") != F.col("vec_id")
    if bucket is not None:
        cond = cond & (F.col(f"q_{bucket}") == F.col(bucket))
        q = queries.select("q_id", "q_vec", F.col(bucket).alias(f"q_{bucket}"))
    else:
        q = queries.select("q_id", "q_vec")
    # Precompute each side's norm ONCE PER VECTOR before the join
    # (r13): inlining norm() into the post-join sim expression
    # re-folded both 64-element arrays for every (query, candidate)
    # row — for a 1000-vector bucket that is 1000x redundant work on
    # the corpus side. The staged columns evaluate the IDENTICAL
    # sequential fold on the identical input, so every bit of sim is
    # unchanged (measured: 0 mismatches over the full sf1 join;
    # 8.3 s -> 3.2 s on the sf1 IVF shape). The DuckDB oracles keep
    # their inline norms — same values, so hash parity holds.
    q = q.withColumn("_q_norm", norm("q_vec"))
    corpus = corpus.withColumn("_e_norm", norm("embedding"))
    j = corpus.join(F.broadcast(q), cond)
    sim = dot("q_vec", "embedding") / (F.col("_q_norm") * F.col("_e_norm"))
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return (
        j.withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "vec_id", F.col("rank").cast("int").alias("rank"), "sim")
    )
