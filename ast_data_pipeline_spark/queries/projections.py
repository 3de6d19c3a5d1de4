"""Projection / scalar-function surface (SURVEY.md §2.2) + filters (§2.3).

The reference's string/path/math ops (P1, P2, P21, P22) and filters
(F1, F2, F8) re-expressed as native column expressions — no Python
UDFs; everything stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import register
from ..sources.catalog import load


@register(
    "p1_path_components",
    oracle="""
WITH u AS (
  SELECT doc_id,
         'https://blob.example/' || lang || '/' || source || '/doc_' || doc_id || '.txt' AS url
  FROM documents
)
SELECT doc_id, url,
       string_split(url, '/')[3]               AS host,
       string_split(url, '/')[4]               AS seg_lang,
       string_split(url, '/')[5]               AS seg_source,
       string_split(url, '/')[6]               AS fname,
       regexp_replace(string_split(url, '/')[6], '\\.txt$', '') AS stem
FROM u
""",
    doc="P1 URL/path component extraction (ref: src/az_proc.py:237-241, "
    "src/form_calcs.py:82-102 split('/') indexing) via split + element_at.",
    tags=("projection",),
)
def p1_path_components(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://blob.example/"),
        F.col("lang"),
        F.lit("/"),
        F.col("source"),
        F.lit("/doc_"),
        F.col("doc_id"),
        F.lit(".txt"),
    )
    d = docs.select("doc_id", url.alias("url"))
    parts = F.split(F.col("url"), "/")
    return d.select(
        "doc_id",
        "url",
        F.element_at(parts, 3).alias("host"),
        F.element_at(parts, 4).alias("seg_lang"),
        F.element_at(parts, 5).alias("seg_source"),
        F.element_at(parts, 6).alias("fname"),
        F.regexp_replace(F.element_at(parts, 6), r"\.txt$", "").alias("stem"),
    )


@register(
    "p2_name_normalize",
    oracle="""
WITH n AS (
  SELECT doc_id, source || '_' || lang || '_' || doc_id || '.txt' AS raw_name
  FROM documents
)
SELECT doc_id, raw_name,
       concat_ws('_',
         regexp_replace(string_split(raw_name, '_')[3], '\\.txt$', ''),
         string_split(raw_name, '_')[1],
         string_split(raw_name, '_')[2]) AS normalized_name
FROM n
""",
    doc="P2 tile-name normalization (ref: src/az_proc.py:478-498, "
    "src/form_calcs.py:88-98): reorder '_'-separated components, drop "
    "extension, via split + concat_ws.",
    tags=("projection",),
)
def p2_name_normalize(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    raw = F.concat_ws("_", "source", "lang", "doc_id")
    d = docs.select("doc_id", F.concat(raw, F.lit(".txt")).alias("raw_name"))
    parts = F.split(F.col("raw_name"), "_")
    return d.select(
        "doc_id",
        "raw_name",
        F.concat_ws(
            "_",
            F.regexp_replace(F.element_at(parts, 3), r"\.txt$", ""),
            F.element_at(parts, 1),
            F.element_at(parts, 2),
        ).alias("normalized_name"),
    )


@register(
    "p21_string_ops",
    oracle="""
SELECT p_partkey,
       lower(p_name)  AS lname,
       upper(p_name)  AS uname,
       upper(substr(p_name, 1, 1)) || lower(substr(p_name, 2)) AS capitalized,
       (p_name LIKE '%et') AS ends_et,
       regexp_replace(p_brand, '[0-9]+', '#', 'g') AS brand_nodigits,
       length(p_name)::INT AS name_len
FROM part
""",
    doc="P21 misc string ops (ref: src/az_proc.py:322 lower, 742-744 "
    "capitalize, 630 endswith; splitext everywhere).",
    tags=("projection",),
)
def p21_string_ops(spark, sf_dir):
    part = load(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.lower("p_name").alias("lname"),
        F.upper("p_name").alias("uname"),
        F.concat(
            F.upper(F.substring("p_name", 1, 1)),
            F.lower(F.expr("substring(p_name, 2)")),
        ).alias("capitalized"),
        F.col("p_name").endswith("et").alias("ends_et"),
        F.regexp_replace("p_brand", "[0-9]+", "#").alias("brand_nodigits"),
        F.length("p_name").alias("name_len"),
    )


@register(
    "p22_math_ops",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ceil(l_quantity / 7.0)::BIGINT AS n_batches,
       abs(l_discount - l_tax)        AS disc_tax_gap,
       least(l_quantity, 25.0)        AS qty_capped,
       greatest(l_quantity, 5.0)      AS qty_floored,
       l_extendedprice * l_discount   AS discount_amount
FROM lineitem
""",
    doc="P22 math ops (ref: src/az_proc.py:513-514 ceil; "
    "src/form_calcs.py:732-733 min/abs; 1023-1024 ratios).",
    tags=("projection",),
)
def p22_math_ops(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.ceil(F.col("l_quantity") / 7.0).alias("n_batches"),
        F.abs(F.col("l_discount") - F.col("l_tax")).alias("disc_tax_gap"),
        F.least(F.col("l_quantity"), F.lit(25.0)).alias("qty_capped"),
        F.greatest(F.col("l_quantity"), F.lit(5.0)).alias("qty_floored"),
        (F.col("l_extendedprice") * F.col("l_discount")).alias("discount_amount"),
    )


@register(
    "f1_f2_recency_filter",
    oracle="""
SELECT strftime(o_orderdate, '%Y') AS order_year,
       o_orderpriority,
       count(*)::BIGINT AS n_orders
FROM orders
WHERE strftime(o_orderdate, '%Y') >= '1998'
  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
GROUP BY 1, 2
""",
    doc="F1 recency (string-compare year >= '2018', ref: src/az_proc.py:245) "
    "+ F2 isin filter (ref: :247), with the reference's string-compare "
    "semantics preserved.",
    tags=("filter",),
)
def f1_f2_recency_filter(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    year = F.date_format("o_orderdate", "yyyy")
    return (
        orders.withColumn("order_year", year)
        .filter(
            (F.col("order_year") >= "1998")
            & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        )
        .groupBy("order_year", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "f8_suffix_filter",
    oracle="""
WITH f AS (
  SELECT source || '/' || doc_id ||
         CASE WHEN doc_id % 3 = 0 THEN '.jpg'
              WHEN doc_id % 3 = 1 THEN '.xml'
              ELSE '.tif' END AS path
  FROM documents
)
SELECT path FROM f
WHERE path LIKE '%.jpg' OR path LIKE '%.xml'
""",
    doc="F8 file-type suffix filters (ref: src/az_proc.py:630 endswith .jpg; "
    "src/form_calcs.py:71-79 .xml/.tif selection).",
    tags=("filter",),
)
def f8_suffix_filter(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    ext = (
        F.when(F.col("doc_id") % 3 == 0, ".jpg")
        .when(F.col("doc_id") % 3 == 1, ".xml")
        .otherwise(".tif")
    )
    path = F.concat_ws("/", "source", "doc_id")
    return (
        docs.select(F.concat(path, ext).alias("path"))
        .filter(F.col("path").endswith(".jpg") | F.col("path").endswith(".xml"))
    )


@register(
    "p_array_functions",
    oracle="""
SELECT vec_id,
       len(list_filter(embedding, x -> x > 0))::INT AS n_pos,
       list_reduce(list_prepend(0.0::DOUBLE,
         list_transform(embedding, x -> abs(x)::DOUBLE)),
         (acc, x) -> CASE WHEN x > acc THEN x ELSE acc END) AS max_abs,
       list_reduce(list_prepend(0.0::DOUBLE,
         list_transform(embedding, x -> abs(x)::DOUBLE)),
         (acc, x) -> acc + x) AS l1_norm
FROM embeddings
""",
    doc="Higher-order array function surface (filter/transform/"
    "aggregate): per-vector positive-component count, max-abs via "
    "left-fold max, L1 norm via sequential left fold (bit-identical "
    "to DuckDB list_reduce; see functions/exact.py rationale).",
    tags=("projection", "array"),
)
def p_array_functions(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    absarr = "transform(embedding, x -> abs(cast(x as double)))"
    return emb.select(
        "vec_id",
        F.expr("size(filter(embedding, x -> x > 0))").cast("int").alias("n_pos"),
        F.expr(
            f"aggregate({absarr}, cast(0.0 as double),"
            " (acc, x) -> if(x > acc, x, acc))"
        ).alias("max_abs"),
        F.expr(
            f"aggregate({absarr}, cast(0.0 as double), (acc, x) -> acc + x)"
        ).alias("l1_norm"),
    )


@register(
    "p_try_functions",
    oracle="""
SELECT event_id,
       TRY_CAST(CASE WHEN event_id % 7 = 0 THEN 'not-a-number'
                     ELSE json_extract_string(props, '$.k') END AS INT)
         AS k_or_null,
       CASE WHEN (event_id % 5) = 0 THEN NULL
            ELSE value / (event_id % 5) END AS safe_div
FROM events
""",
    doc="Robust-ingestion surface: try_cast swallows malformed values "
    "to NULL instead of failing the job (every 7th value corrupted "
    "deterministically); try_divide maps div-by-zero to NULL. The "
    "fail-soft semantics a 100 TB ingest needs — one bad record must "
    "not kill a 6-hour job.",
    tags=("projection", "quality"),
)
def p_try_functions(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    raw = F.when(F.col("event_id") % 7 == 0, F.lit("not-a-number")).otherwise(
        F.get_json_object("props", "$.k")
    )
    return ev.select(
        "event_id",
        raw.try_cast("int").alias("k_or_null"),
        F.try_divide("value", F.col("event_id") % 5).alias("safe_div"),
    )
