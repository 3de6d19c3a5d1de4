"""Deduplication operators for large-scale training-data pipelines
(BASELINE.json north-star; SURVEY §2.10 extensions).

All four families are expressed as pure DataFrame transforms that
scale by shuffle-on-key — no driver-side state:

- exact:      hash(normalized text) -> groupBy -> keep canonical row
- MinHash+LSH: shingle -> k minhashes -> band -> bucket self-join ->
               exact-Jaccard verify on candidates only
- SimHash:    per-token 32-bit hash -> per-bit majority vote ->
               byte-banding -> hamming verify
- n-gram Jaccard: exact set similarity on a bucketed candidate space

Hashes are md5-based (deterministic, engine-portable) rather than
xxhash/murmur so the DuckDB oracles replay the identical pipeline.
At 100 TB the md5 cost is the standard trade for reproducibility;
swapping in xxhash64 is a one-line change per function.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---- shingling ---------------------------------------------------------

def words_col(text: Column) -> Column:
    return F.split(F.lower(text), " ")


def word_shingles(text: Column, k: int) -> Column:
    """Distinct word k-grams. 0-based ``words[i]`` indexing inside the
    lambda matches DuckDB's 1-based list_transform oracle by shifting
    the sequence bounds."""
    joined = " || ' ' || ".join(f"w[i + {j}]" for j in range(k))
    return F.expr(
        f"array_distinct(transform(sequence(0, size(w) - {k}), i -> {joined}))"
    ).alias("shingles")


def word_shingles_sql(text_expr: str, k: int) -> str:
    joined = " || ' ' || ".join(f"w[i + {j}]" for j in range(k))
    return (
        f"list_distinct(list_transform(generate_series(1, len(w) - {k - 1}),"
        f" i -> {joined}))"
    )


def char_ngrams(text: Column, n: int) -> Column:
    return F.expr(
        f"array_distinct(transform(sequence(1, length(t) - {n - 1}), i -> substring(t, i, {n})))"
    )


def char_ngrams_sql(n: int) -> str:
    return (
        f"list_distinct(list_transform(generate_series(1, len(t) - {n - 1}),"
        f" i -> substr(t, i, {n})))"
    )


# ---- minhash -----------------------------------------------------------

def minhash_signatures(
    exploded: DataFrame, num_hashes: int, doc_col: str = "doc_id", shingle_col: str = "shingle"
) -> DataFrame:
    """One shuffle: ``num_hashes`` min-aggregates over md5(i|shingle).

    md5 hex compares lexicographically == comparing the 128-bit value.
    """
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col(shingle_col)))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return exploded.groupBy(doc_col).agg(*aggs)


def lsh_bands(sig: DataFrame, num_hashes: int, rows_per_band: int, doc_col: str = "doc_id") -> DataFrame:
    n_bands = num_hashes // rows_per_band
    bands = F.array(
        *[
            F.concat(
                *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
            )
            for b in range(n_bands)
        ]
    )
    return (
        sig.select(doc_col, F.posexplode(bands).alias("band_id", "band_val"))
    )


def candidate_pairs(bands: DataFrame, doc_col: str = "doc_id") -> DataFrame:
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{doc_col}") < F.col(f"b.{doc_col}")),
        )
        .select(
            F.col(f"a.{doc_col}").alias("doc_a"), F.col(f"b.{doc_col}").alias("doc_b")
        )
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame, doc_sets: DataFrame, threshold: float, doc_col: str = "doc_id",
    set_col: str = "shingles",
) -> DataFrame:
    """Exact Jaccard on candidates only (ints -> identical doubles)."""
    sa = doc_sets.select(
        F.col(doc_col).alias("doc_a"), F.col(set_col).alias("set_a")
    )
    sb = doc_sets.select(
        F.col(doc_col).alias("doc_b"), F.col(set_col).alias("set_b")
    )
    j = (
        pairs.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("set_a", "set_b"))
            / F.size(F.array_union("set_a", "set_b")),
        )
    )
    return j.filter(F.col("jaccard") >= threshold).select("doc_a", "doc_b", "jaccard")


def minhash_neardup_compact(
    docsets: DataFrame,
    num_hashes: int,
    rows_per_band: int,
    threshold: float,
    doc_col: str = "doc_id",
    set_col: str = "shingles",
) -> DataFrame:
    """MinHash+LSH near-dup pairs in one compact flow.

    The shingle set rides along through the signature aggregation and
    the band self-join, so verification needs no re-join of the doc-set
    table: one agg shuffle + one band-join shuffle + a final dedup. The
    classic 3-join layout (see ``jaccard_verify``) shuffles the arrays
    twice anyway — carrying them once through the band join moves the
    same bytes in fewer stages.
    """
    exploded = docsets.select(doc_col, set_col, F.explode(set_col).alias("shingle"))
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = exploded.groupBy(doc_col).agg(F.first(set_col).alias(set_col), *aggs)
    n_bands = num_hashes // rows_per_band
    bands_arr = F.array(
        *[
            F.concat(*[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)])
            for b in range(n_bands)
        ]
    )
    banded = sig.select(
        doc_col, set_col, F.posexplode(bands_arr).alias("band_id", "band_val")
    )
    a, b = banded.alias("a"), banded.alias("b")
    jac = F.size(F.array_intersect(f"a.{set_col}", f"b.{set_col}")).cast(
        "double"
    ) / F.size(F.array_union(f"a.{set_col}", f"b.{set_col}")).cast("double")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{doc_col}") < F.col(f"b.{doc_col}")),
        )
        .select(
            F.col(f"a.{doc_col}").alias("doc_a"),
            F.col(f"b.{doc_col}").alias("doc_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .distinct()
    )


# ---- simhash -----------------------------------------------------------

def token_hash32(tok: Column) -> Column:
    """Deterministic 32-bit token hash: first 8 md5 hex digits."""
    return F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")


def simhash32(tokens_exploded: DataFrame, doc_col: str = "doc_id", tok_col: str = "tok") -> DataFrame:
    """Per-bit majority vote over token hashes -> 32-bit signature."""
    h = token_hash32(F.col(tok_col))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s{j}")
        for j in range(32)
    ]
    per_doc = tokens_exploded.groupBy(doc_col).agg(*bit_sums)
    sig = None
    for j in range(32):
        bit = F.when(F.col(f"s{j}") >= 0, F.lit(2**j)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return per_doc.select(doc_col, sig.cast("long").alias("simhash"))


def simhash_pairs(sig: DataFrame, max_hamming: int, doc_col: str = "doc_id") -> DataFrame:
    """Byte-banding: pairs within hamming<=3 of a 32-bit sig share at
    least one of 4 bytes (pigeonhole); verify with bit_count(xor)."""
    bytes_arr = F.array(
        *[F.shiftright(F.col("simhash"), 8 * b).bitwiseAND(F.lit(255)) for b in range(4)]
    )
    banded = sig.select(doc_col, "simhash", F.posexplode(bytes_arr).alias("byte_id", "byte_val"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.byte_id") == F.col("b.byte_id"))
            & (F.col("a.byte_val") == F.col("b.byte_val"))
            & (F.col(f"a.{doc_col}") < F.col(f"b.{doc_col}")),
        )
        .select(
            F.col(f"a.{doc_col}").alias("doc_a"),
            F.col(f"b.{doc_col}").alias("doc_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
