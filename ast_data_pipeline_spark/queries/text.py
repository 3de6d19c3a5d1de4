"""Text-analysis query surface over ``documents``."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators.text import (
    EN_STOPWORDS,
    STOPWORDS,
    hit_ratio,
    hit_ratio_sql,
    punct_ratio,
    punct_ratio_sql,
    token_counts,
    winnow_fingerprint,
    winnow_fingerprint_sql,
)
from ..registry import register
from ..sources.catalog import load

_LANGS = sorted(STOPWORDS)  # de, en, es, fr, zh


def _langid_pred_sql() -> str:
    # argmax with lexicographic tie-break == nested CASE over sorted langs
    best = f"greatest({', '.join(f'score_{l}' for l in _LANGS)})"
    whens = "\n       ".join(
        f"WHEN score_{l} = {best} THEN '{l}'" for l in _LANGS
    )
    return f"(CASE {whens} END)"


_SCORES_SQL = ",\n         ".join(
    f"{hit_ratio_sql('w', STOPWORDS[l])} AS score_{l}" for l in _LANGS
)
_SCORE_COLS = ", ".join(f"score_{l}" for l in _LANGS)


@register(
    "x_lang_id",
    oracle=f"""
WITH scored AS (
  SELECT doc_id, lang,
         {_SCORES_SQL}
  FROM (SELECT doc_id, lang, string_split(lower(text), ' ') AS w FROM documents)
)
SELECT doc_id, lang AS actual_lang,
       {_SCORE_COLS},
       {_langid_pred_sql()} AS predicted_lang,
       ({_langid_pred_sql()} = lang) AS correct
FROM scored
""",
    doc="Language-ID heuristic: per-language stopword hit-ratio scores, "
    "argmax with lexicographic tie-break. (The synthetic corpus is "
    "language-agnostic word salad — the operator's mechanics, not its "
    "accuracy, are under test.)",
    tags=("text",),
)
def x_lang_id(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").withColumn(
        "w", F.split(F.lower("text"), " ")
    )
    scored = docs.select(
        "doc_id",
        F.col("lang").alias("actual_lang"),
        *[hit_ratio("w", STOPWORDS[l]).alias(f"score_{l}") for l in _LANGS],
    )
    best = F.greatest(*[F.col(f"score_{l}") for l in _LANGS])
    # argmax with lexicographic tie-break: first lang (sorted) whose
    # score equals the max wins — mirrors the oracle's CASE order
    pred_expr = None
    for l in _LANGS:
        cond = F.col(f"score_{l}") == best
        pred_expr = F.when(cond, F.lit(l)) if pred_expr is None else pred_expr.when(cond, F.lit(l))
    return scored.select(
        "doc_id", "actual_lang",
        *[f"score_{l}" for l in _LANGS],
        pred_expr.alias("predicted_lang"),
        (pred_expr == F.col("actual_lang")).alias("correct"),
    )


@register(
    "x_text_quality",
    oracle=f"""
SELECT doc_id,
       length(text)::BIGINT AS n_chars_measured,
       len(w)::BIGINT AS n_tokens,
       (length(text)::DOUBLE / len(w)::DOUBLE) AS chars_per_token,
       {punct_ratio_sql('text')} AS punct_ratio,
       {hit_ratio_sql('w', EN_STOPWORDS)} AS stopword_ratio,
       (CASE WHEN len(w) >= 20 AND len(w) <= 400 THEN 1.0 ELSE 0.0 END) * 0.4
         + least({hit_ratio_sql('w', EN_STOPWORDS)} * 2.0, 1.0) * 0.4
         + (1.0 - least({punct_ratio_sql('text')} * 10.0, 1.0)) * 0.2 AS quality_score
FROM (SELECT doc_id, text, string_split(lower(text), ' ') AS w FROM documents)
""",
    doc="Quality scoring: length/punctuation/stopword-ratio heuristics "
    "composed into a [0,1] score — the standard pre-training filter "
    "features (Gopher/C4-style rules), all codegen'd expressions.",
    tags=("text", "bench"),
)
def x_text_quality(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").withColumn(
        "w", F.split(F.lower("text"), " ")
    )
    n_tok = F.size("w").cast("long")
    stop = hit_ratio("w", EN_STOPWORDS)
    punct = punct_ratio(F.col("text"))
    length_ok = F.when((n_tok >= 20) & (n_tok <= 400), F.lit(1.0)).otherwise(F.lit(0.0))
    quality = (
        length_ok * 0.4
        + F.least(stop * 2.0, F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(punct * 10.0, F.lit(1.0))) * 0.2
    )
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_measured"),
        n_tok.alias("n_tokens"),
        (F.length("text").cast("double") / F.size("w").cast("double")).alias(
            "chars_per_token"
        ),
        punct.alias("punct_ratio"),
        stop.alias("stopword_ratio"),
        quality.alias("quality_score"),
    )


@register(
    "x_token_count",
    oracle=r"""
SELECT doc_id,
       len(regexp_split_to_array(text, '\s+'))::INT AS n_ws_tokens,
       len(regexp_extract_all(text, '\w+|[^\w\s]'))::INT AS n_bpe_tokens,
       (n_chars = length(text)) AS n_chars_consistent
FROM documents
""",
    doc="Token counting: whitespace tokens + a BPE-ish regex (word "
    "pieces and standalone punctuation) — the cost-estimation pass of "
    "a data pipeline.",
    tags=("text",),
)
def x_token_count(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    ws, bpe = token_counts(F.col("text"))
    return docs.select(
        "doc_id",
        ws.cast("int").alias("n_ws_tokens"),
        bpe.cast("int").alias("n_bpe_tokens"),
        (F.col("n_chars") == F.length("text")).alias("n_chars_consistent"),
    )


@register(
    "x_fingerprint",
    oracle=f"""
SELECT doc_id,
       md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp_full,
       {winnow_fingerprint_sql('w')} AS fp_winnow
FROM (SELECT doc_id, text, string_split(lower(text), ' ') AS w FROM documents)
WHERE len(w) >= 5
""",
    doc="Document fingerprinting: md5 of whitespace-normalized text "
    "(exact) + min-hash over word 5-grams (winnowing-style rolling "
    "fingerprint, robust to local edits).",
    tags=("text",),
)
def x_fingerprint(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").withColumn(
        "w", F.split(F.lower("text"), " ")
    )
    return (
        docs.filter(F.size("w") >= 5)
        .select(
            "doc_id",
            F.md5(F.regexp_replace(F.lower("text"), r"\s+", " ")).alias("fp_full"),
            winnow_fingerprint("w").alias("fp_winnow"),
        )
    )


@register(
    "x_heavy_hitters",
    oracle=r"""
WITH toks AS (
  SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents
),
counted AS (
  SELECT tok, count(*)::BIGINT AS n FROM toks
  WHERE tok <> '' GROUP BY tok
)
SELECT tok, n,
       row_number() OVER (ORDER BY n DESC, tok)::INT AS rank
FROM counted
ORDER BY n DESC, tok
LIMIT 50
""",
    doc="Corpus heavy hitters: top-50 most frequent tokens. explode -> "
    "count (map-side partial agg absorbs the zipf head) -> global "
    "top-k via TakeOrderedAndProject, not a full sort. The vocabulary/"
    "stopword-discovery pass of a text pipeline.",
    tags=("text", "extension"),
)
def x_heavy_hitters(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower("text"), " ", -1)).alias("tok")
    ).filter(F.col("tok") != "")
    counted = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy(F.desc("n"), "tok")
    return (
        counted.orderBy(F.desc("n"), "tok")
        .limit(50)
        .withColumn("rank", F.row_number().over(w).cast("int"))
    )


CHUNK_LEN = 120
CHUNK_STRIDE = 90  # 30-char overlap


@register(
    "x_doc_chunking",
    oracle=f"""
SELECT doc_id, chunk_idx,
       substr(text, (chunk_idx * {CHUNK_STRIDE}) + 1, {CHUNK_LEN}) AS chunk,
       length(substr(text, (chunk_idx * {CHUNK_STRIDE}) + 1, {CHUNK_LEN}))::INT AS chunk_len
FROM (
  SELECT doc_id, text,
         unnest(generate_series(0,
           greatest(0, ((length(text) - 1) // {CHUNK_STRIDE})::INT))) AS chunk_idx
  FROM documents
)
WHERE chunk_idx * {CHUNK_STRIDE} < length(text)
""",
    doc="Fixed-window document chunking with overlap (len 120, stride "
    "90): explode(sequence) fan-out + substring — the context-window "
    "splitting pass of a training-data pipeline, zero Python. Row "
    "explosion is bounded by ceil(len/stride) per doc.",
    tags=("text", "extension"),
)
def x_doc_chunking(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    n_chunks_minus1 = F.greatest(
        F.lit(0), F.floor((F.length("text") - 1) / CHUNK_STRIDE).cast("int")
    )
    exploded = docs.select(
        "doc_id",
        "text",
        F.explode(F.sequence(F.lit(0), n_chunks_minus1)).alias("chunk_idx"),
    ).filter(F.col("chunk_idx") * CHUNK_STRIDE < F.length("text"))
    chunk = F.expr(f"substring(text, chunk_idx * {CHUNK_STRIDE} + 1, {CHUNK_LEN})")
    return exploded.select(
        "doc_id",
        "chunk_idx",
        chunk.alias("chunk"),
        F.length(chunk).cast("int").alias("chunk_len"),
    )


PACK_BUDGET = 2048  # tokens per training sequence / context window


@register(
    "x_sequence_packing",
    oracle=rf"""
WITH toks AS (
  SELECT source, doc_id,
         len(regexp_extract_all(text, '\w+|[^\w\s]'))::BIGINT AS n_tokens
  FROM documents
), packed AS (
  SELECT source, doc_id, n_tokens,
         floor(coalesce(sum(n_tokens) OVER (
             PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           / {PACK_BUDGET}.0)::BIGINT AS pack_id
  FROM toks
)
SELECT source, pack_id,
       count(*)::BIGINT AS n_docs,
       sum(n_tokens)::BIGINT AS pack_tokens,
       min(doc_id)::BIGINT AS first_doc_id,
       max(doc_id)::BIGINT AS last_doc_id
FROM packed
GROUP BY source, pack_id
""",
    doc="Sequence packing for LLM training: contiguous token-budget "
    "binning — docs ordered by doc_id within source, a doc opens pack "
    "k when the tokens BEFORE it fill k budgets (exclusive running "
    "sum, one window pass; integer token counts keep the oracle "
    "bit-exact). The deterministic streaming-friendly flavor of "
    "greedy packing: at 100 TB each source packs independently (the "
    "window partitions parallelize) and pack ids are stable across "
    "re-runs, so shards can be built incrementally.",
    tags=("text", "extension"),
)
def x_sequence_packing(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    _, bpe = token_counts(F.col("text"))
    toks = docs.select(
        "source", "doc_id", bpe.cast("bigint").alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = toks.withColumn(
        "pack_id",
        F.floor(
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / PACK_BUDGET
        ).cast("bigint"),
    )
    return packed.groupBy("source", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("pack_tokens"),
        F.min("doc_id").alias("first_doc_id"),
        F.max("doc_id").alias("last_doc_id"),
    )
