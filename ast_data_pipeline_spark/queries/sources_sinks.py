"""Source/sink query surface (SURVEY.md §2.1) + work-queue / tracking
pipelines (§3.2, honorable mentions).

The XML and GeoJSON readers are verified by ROUND-TRIP: the engine
renders documents from a domain view, parses them back with the
JVM-side reader, and the oracle is the view projection itself — the
render+parse pair must be the identity.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from ast_data_pipeline_spark.lineage import lineage_cut_lazy

from ..plans.workqueue import run_rounds
from ..registry import register
from ..sources.catalog import load
from ..sources.domain_views import annotations, counties, domain_ctes, images, with_domain
from ..sources.readers import (
    flatten_geojson_features,
    parse_voc_xml,
    read_points_csv,
    voc_object_fragment,
    voc_xml_doc,
)


@register(
    "s3_voc_xml_roundtrip",
    oracle=with_domain(
        """
SELECT image_name, raw_label, truncated, difficult, xmin, ymin, xmax, ymax
FROM annotations
""",
        "annotations",
    ),
    doc="S3/K3 Pascal-VOC XML: render per-image documents from the "
    "annotations view (K3 sink format, ref src/form_calcs.py:552-637), "
    "parse them back with JVM xpath functions (S3, ref src/az_proc.py:"
    "793-819). Oracle = the original view: render+parse is the identity.",
    tags=("source", "domain"),
)
def s3_voc_xml_roundtrip(spark, sf_dir):
    a = annotations(spark, sf_dir)
    frag = voc_object_fragment(
        F.col("raw_label"), F.col("truncated"), F.col("difficult"),
        F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"),
    )
    docs = (
        a.withColumn("frag", frag)
        .groupBy("image_name")
        .agg(F.concat_ws("", F.sort_array(F.collect_list("frag"))).alias("objects_xml"))
        .select(voc_xml_doc(F.col("image_name"), F.col("objects_xml")).alias("xml"))
    )
    return parse_voc_xml(docs)


@register(
    "s5_geojson_flatten",
    oracle=with_domain(
        """
SELECT county_name, state_fips, county_fips, c_minx, c_miny, c_maxx, c_maxy
FROM counties
""",
        "counties",
    ),
    doc="S5 GeoJSON feature scan: render Feature JSON from the counties "
    "view, parse with from_json + flatten (ref: "
    "distribution_by_county_state.py:27). Oracle = the view itself.",
    tags=("source", "domain"),
)
def s5_geojson_flatten(spark, sf_dir):
    c = counties(spark, sf_dir)
    feature = F.to_json(
        F.struct(
            F.lit("Feature").alias("type"),
            F.struct("county_name", "state_fips", "county_fips").alias("properties"),
            F.struct(
                F.lit("Polygon").alias("type"),
                F.array("c_minx", "c_miny", "c_maxx", "c_maxy").alias("bbox"),
            ).alias("geometry"),
        )
    )
    return flatten_geojson_features(c.select(feature.alias("feature_json")))


@register(
    "s1_csv_variant_schema",
    oracle="""
SELECT c_custkey,
       (c_custkey * 7 % 360 - 180)::DOUBLE AS lon,
       (c_custkey * 13 % 180 - 90)::DOUBLE AS lat,
       CASE WHEN c_custkey % 2 = 0 THEN 'xy' ELSE 'lonlat' END AS variant
FROM customer
""",
    doc="S1/F3 CSV scan with variant-schema resolution (ref: "
    "src/az_proc.py:275-290): two CSVs are written with X,Y vs "
    "LONGITUDE,LATITUDE headers, read back through the resolver, and "
    "normalized to lon/lat.",
    tags=("source",),
)
def s1_csv_variant_schema(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    base = cust.select(
        "c_custkey",
        (F.col("c_custkey") * 7 % 360 - 180).cast("double").alias("lon"),
        (F.col("c_custkey") * 13 % 180 - 90).cast("double").alias("lat"),
    )
    tmp = os.path.join(tempfile.gettempdir(), "ast_csv_variants", os.path.basename(sf_dir.rstrip("/")))
    xy_path, ll_path = f"{tmp}/xy", f"{tmp}/lonlat"
    base.filter(F.col("c_custkey") % 2 == 0).select(
        "c_custkey", F.col("lon").alias("X"), F.col("lat").alias("Y")
    ).write.mode("overwrite").option("header", True).csv(xy_path)
    base.filter(F.col("c_custkey") % 2 != 0).select(
        "c_custkey", F.col("lon").alias("LONGITUDE"), F.col("lat").alias("LATITUDE")
    ).write.mode("overwrite").option("header", True).csv(ll_path)
    xy = read_points_csv(spark, xy_path).select(
        F.col("c_custkey").cast("long").alias("c_custkey"), "lon", "lat",
        F.lit("xy").alias("variant"),
    )
    ll = read_points_csv(spark, ll_path).select(
        F.col("c_custkey").cast("long").alias("c_custkey"), "lon", "lat",
        F.lit("lonlat").alias("variant"),
    )
    return xy.unionByName(ll)


def _s8_oracle() -> str:
    from ..sources.catalog import TABLES

    return "\nUNION ALL\n".join(
        f"SELECT '{t}.parquet' AS file_name, count(*)::BIGINT AS n_rows FROM {t}"
        for t in TABLES
    )


@register(
    "s8_file_catalog",
    oracle=_s8_oracle(),
    doc="S8 directory-listing source (ref: src/az_proc.py:61-106 dir "
    "enumeration; src/form_calcs.py:1058-1066): file catalog via "
    "input_file_name() — one row per data file with its row count.",
    tags=("source",),
)
def s8_file_catalog(spark, sf_dir):
    # schemas differ per file, so the catalog is a union of per-file
    # scans keyed by input_file_name() (the manifest-table pattern)
    from ..sources.catalog import TABLES
    from ..sources.catalog import load as _load

    parts = [
        _load(spark, sf_dir, t).select(
            F.element_at(F.split(F.input_file_name(), "/"), -1).alias("file_name")
        )
        for t in TABLES
    ]
    allf = parts[0]
    for p in parts[1:]:
        allf = allf.unionByName(p)
    return allf.groupBy("file_name").agg(F.count(F.lit(1)).alias("n_rows"))


@register(
    "d_workqueue_rounds",
    oracle="""
WITH ranked AS (
  SELECT o_orderkey, row_number() OVER (ORDER BY o_orderkey) AS rn,
         count(*) OVER () AS total
  FROM orders
)
SELECT r AS round,
       (SELECT count(*) FROM ranked WHERE rn > (r - 1) * 200 AND rn <= r * 200)::BIGINT
         AS n_allocated,
       (SELECT (max(total) - 600) FROM ranked)::BIGINT AS n_remaining_final,
       600::BIGINT AS n_labeled_final
FROM unnest([1, 2, 3]) t(r)
""",
    doc="SURVEY §3.2 work-queue: three allocation rounds of 200 over the "
    "orders queue (O3 limit + U2 anti + U1 append + U4 integrity raise), "
    "driver-looped like the reference's per-round np.save cycle.",
    tags=("pipeline", "limit"),
)
def d_workqueue_rounds(spark, sf_dir):
    queue = load(spark, sf_dir, "orders").select("o_orderkey")
    return run_rounds(queue, "o_orderkey", 200, 3)


@register(
    "d_tracking_pipeline",
    oracle=f"""
WITH {domain_ctes('images', 'annotations')},
tracking AS (
  SELECT i.image_name, i.tile_name,
         (a.image_name IS NOT NULL) AS has_annotation,
         CASE WHEN i.tile_key % 9 = 0 THEN NULL
              ELSE 'chips/' || i.image_name || '.jpg' END AS pathway
  FROM images i LEFT JOIN (SELECT DISTINCT image_name FROM annotations) a
    ON i.image_name = a.image_name
),
repaired AS (
  SELECT image_name, tile_name, has_annotation,
         coalesce(pathway, 'restored/' || image_name || '.jpg') AS pathway
  FROM tracking
),
alloc AS (
  SELECT image_name,
         row_number() OVER (ORDER BY image_name) AS rn
  FROM repaired WHERE NOT has_annotation
)
SELECT r.image_name, r.tile_name, r.has_annotation, r.pathway,
       (CASE WHEN a.rn IS NOT NULL AND a.rn <= 150
             THEN (['amy', 'bob', 'cat'])[((a.rn - 1) % 3 + 1)::INT] END) AS verify_coverage
FROM repaired r LEFT JOIN alloc a ON r.image_name = a.image_name
""",
    doc="Tracking-table pipeline (ref: track_annotator_draw.py:22-36 J9 "
    "build; src/az_proc.py:674-706 J4 pathway repair; :731-758 F7 "
    "verification allocation) composed as one DataFrame job.",
    tags=("pipeline", "domain"),
)
def d_tracking_pipeline(spark, sf_dir):
    im = images(spark, sf_dir)
    ann = annotations(spark, sf_dir).select("image_name").distinct().withColumn(
        "has", F.lit(True)
    )
    tracking = (
        im.join(ann, "image_name", "left")
        .select(
            "image_name",
            "tile_name",
            F.coalesce(F.col("has"), F.lit(False)).alias("has_annotation"),
            F.when(
                F.col("tile_key") % 9 == 0, F.lit(None)
            ).otherwise(
                F.concat(F.lit("chips/"), F.col("image_name"), F.lit(".jpg"))
            ).alias("pathway"),
        )
    )
    repaired = tracking.withColumn(
        "pathway",
        F.coalesce(
            F.col("pathway"),
            F.concat(F.lit("restored/"), F.col("image_name"), F.lit(".jpg")),
        ),
    )
    from pyspark.sql import Window

    # Only ranks <= 150 ever receive a verifier, so TakeOrdered the
    # first 150 names (orderBy+limit -> per-partition heaps) and rank
    # the 150-row result — the prior global row_number funneled every
    # blank chip (chip-cardinality, grows with data) through one
    # reducer (VERDICT r7 watch item). Rows past rank 150 simply have
    # no alloc row -> NULL rn -> NULL verify_coverage, identical to
    # the rn > 150 branch of the CASE.
    alloc = (
        repaired.filter(~F.col("has_annotation"))
        .select("image_name")
        .orderBy("image_name")
        .limit(150)
        .withColumn("rn", F.row_number().over(Window.orderBy("image_name")))
    )
    verifiers = F.array(F.lit("amy"), F.lit("bob"), F.lit("cat"))
    return (
        repaired.join(alloc, "image_name", "left")
        .select(
            "image_name", "tile_name", "has_annotation", "pathway",
            F.when(
                F.col("rn").isNotNull() & (F.col("rn") <= 150),
                F.element_at(verifiers, ((F.col("rn") - 1) % 3 + 1).cast("int")),
            ).alias("verify_coverage"),
        )
    )


@register(
    "s11_orc_roundtrip",
    oracle="""
SELECT year(o_orderdate)::INTEGER AS order_year, o_orderpriority,
       count(*)::BIGINT AS n_orders,
       round(sum((o_totalprice)::DECIMAL(30,10)), 4)::DOUBLE AS total_price
FROM orders
WHERE year(o_orderdate) = 1996
GROUP BY order_year, o_orderpriority
""",
    doc="S11 ORC source/sink round-trip: orders written as ORC "
    "partitioned by order year (Spark's built-in ORC writer), read "
    "back with a partition-pruned scan (year filter hits "
    "PartitionFilters, not data), aggregated. Oracle = the same "
    "aggregate straight off parquet — write+read must be the "
    "identity. Exercises the second columnar format a lakehouse "
    "ingests besides parquet; at 100 TB the partition layout IS the "
    "pruning index.",
    tags=("source",),
)
def s11_orc_roundtrip(spark, sf_dir):
    from ..functions.exact import dsum

    orders = load(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate").cast("int")
    )
    tmp = os.path.join(
        tempfile.gettempdir(), "ast_orc_roundtrip", os.path.basename(sf_dir.rstrip("/"))
    )
    orders.write.mode("overwrite").partitionBy("order_year").orc(tmp)
    back = spark.read.orc(tmp).filter(F.col("order_year") == 1996)
    return back.groupBy("order_year", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("total_price"),
    )


@register(
    "s12_jsonl_roundtrip",
    oracle="""
SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
       user_id, event_type, value, props
FROM events
WHERE event_type = 'purchase'
""",
    doc="S12 JSON-lines source/sink round-trip: purchase events "
    "written as newline-delimited JSON with explicit microsecond "
    "timestamp formatting, read back through spark.read.json with a "
    "declared schema (never schema inference at scale — one pass, "
    "stable types), timestamps re-parsed. Oracle = the same "
    "projection off parquet; the timestamp goes out as a formatted "
    "string at the contract boundary (UTC session TZ).",
    tags=("source",),
)
def s12_jsonl_roundtrip(spark, sf_dir):
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    tmp = os.path.join(
        tempfile.gettempdir(), "ast_jsonl_roundtrip", os.path.basename(sf_dir.rstrip("/"))
    )
    out = ev.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
        "user_id", "event_type", "value", "props",
    )
    out.write.mode("overwrite").json(tmp)
    schema = (
        "event_id bigint, ts_str string, user_id bigint,"
        " event_type string, value double, props string"
    )
    back = spark.read.schema(schema).json(tmp)
    return back.select(
        "event_id", "ts_str", "user_id", "event_type", "value", "props"
    )


@register(
    "s13_fixed_width_roundtrip",
    # Fixed-width (mainframe/COBOL copybook) text codec round-trip:
    # orders render to 58-char records via format_string, write as
    # plain text, read back with spark.read.text and parse by column
    # positions. The oracle projects the expected parsed values off
    # parquet — totalprice goes through the same %.2f formatting on
    # both engines (printf of identical doubles), so the re-parsed
    # number is deterministic.
    oracle="""
SELECT o_orderkey, o_custkey,
       o_orderstatus AS status,
       printf('%.2f', o_totalprice)::DOUBLE AS totalprice_2dp,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       o_orderpriority AS priority
FROM orders
WHERE o_orderpriority = '1-URGENT'
""",
    doc="S13 fixed-width source/sink round-trip: render -> text file "
    "-> positional substring parse with declared offsets (never "
    "delimiter sniffing), trims and casts back to typed columns. The "
    "legacy-feed ingestion path next to CSV/JSONL/ORC/XML.",
    tags=("source",),
)
def s13_fixed_width_roundtrip(spark, sf_dir):
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    tmp = os.path.join(
        tempfile.gettempdir(), "ast_fw_roundtrip", os.path.basename(sf_dir.rstrip("/"))
    )
    line = F.format_string(
        "%10d%10d%1s%12.2f%10s%-15s",
        F.col("o_orderkey"),
        F.col("o_custkey"),
        F.col("o_orderstatus"),
        F.col("o_totalprice"),
        F.date_format("o_orderdate", "yyyy-MM-dd"),
        F.col("o_orderpriority"),
    )
    orders.select(line.alias("value")).write.mode("overwrite").text(tmp)
    back = spark.read.text(tmp)
    v = F.col("value")
    return back.select(
        F.trim(F.substring(v, 1, 10)).cast("long").alias("o_orderkey"),
        F.trim(F.substring(v, 11, 10)).cast("long").alias("o_custkey"),
        F.substring(v, 21, 1).alias("status"),
        F.trim(F.substring(v, 22, 12)).cast("double").alias("totalprice_2dp"),
        F.substring(v, 34, 10).alias("order_date"),
        F.rtrim(F.substring(v, 44, 15)).alias("priority"),
    )


@register(
    "s14_schema_evolution",
    # Schema-evolution read: two parquet snapshots of the same table
    # written with DIFFERENT column sets (v1 lacks the later-added
    # o_comment_len column) read together with mergeSchema — the lake
    # reality where a 100 TB table's old partitions predate new
    # columns. The unified frame must null-fill the missing column for
    # v1 rows; the oracle models exactly that with a UNION of
    # projections.
    oracle="""
SELECT o_orderkey, o_orderstatus,
       NULL::BIGINT AS o_comment_len, 'v1' AS snapshot
FROM orders WHERE o_custkey % 2 = 0
UNION ALL
SELECT o_orderkey, o_orderstatus,
       length(o_orderpriority)::BIGINT AS o_comment_len, 'v2' AS snapshot
FROM orders WHERE o_custkey % 2 <> 0
""",
    doc="S14 mergeSchema evolution read: v1/v2 partitions with "
    "divergent schemas unify into one frame with null-filled new "
    "columns — proven by the union-of-projections oracle. At scale "
    "the merged schema comes from footer sampling; the declared-"
    "schema read path (s12) remains the production default.",
    tags=("source",),
)
def s14_schema_evolution(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    tmp = os.path.join(
        tempfile.gettempdir(), "ast_schema_evo", os.path.basename(sf_dir.rstrip("/"))
    )
    v1 = orders.filter(F.col("o_custkey") % 2 == 0).select(
        "o_orderkey", "o_orderstatus"
    )
    v2 = orders.filter(F.col("o_custkey") % 2 != 0).select(
        "o_orderkey",
        "o_orderstatus",
        F.length("o_orderpriority").cast("long").alias("o_comment_len"),
    )
    v1.write.mode("overwrite").parquet(os.path.join(tmp, "snapshot=v1"))
    v2.write.mode("overwrite").parquet(os.path.join(tmp, "snapshot=v2"))
    back = spark.read.option("mergeSchema", "true").parquet(tmp)
    return back.select(
        "o_orderkey", "o_orderstatus", "o_comment_len", "snapshot"
    )


@register(
    "s15_corrupt_record_quarantine",
    # Bad-record quarantine: a JSONL feed where every 25th record is
    # truncated mid-object (the classic upstream-crash artifact) read
    # in PERMISSIVE mode with a _corrupt_record column — good rows
    # parse, bad rows quarantine with their raw payload preserved for
    # replay. The census proves the split; FAILFAST would abort the
    # whole 100 TB ingest for one bad line, DROPMALFORMED would
    # silently lose data — PERMISSIVE+quarantine is the production
    # posture. Corruption rule is deterministic (doc_id % 25 = 0), so
    # the oracle derives the same split from parquet.
    oracle="""
SELECT (doc_id % 25 = 0) AS is_corrupt,
       count(*)::BIGINT AS n_rows,
       min(doc_id) AS first_doc,
       max(doc_id) AS last_doc
FROM documents
GROUP BY 1
""",
    doc="PERMISSIVE JSON ingestion with corrupt-record quarantine: "
    "malformed lines land in _corrupt_record instead of failing the "
    "job or vanishing; the report counts both sides with "
    "deterministic id bounds. One scan of the staged feed; the "
    "quarantine column is only materialized for bad rows.",
    tags=("source", "quality"),
)
def s15_corrupt_record_quarantine(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    tmp = os.path.join(
        tempfile.gettempdir(), "ast_corrupt_jsonl", os.path.basename(sf_dir.rstrip("/"))
    )
    line = F.when(
        F.col("doc_id") % 25 == 0,
        # truncated mid-object: unparseable, but doc_id still visible
        F.format_string('{"doc_id": %d, "source": "', F.col("doc_id")),
    ).otherwise(
        F.format_string('{"doc_id": %d, "source": "%s"}', F.col("doc_id"), F.col("source"))
    )
    docs.select(line.alias("value")).write.mode("overwrite").text(tmp)
    back = (
        spark.read.schema("doc_id bigint, source string, _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(tmp)
        # Pin the parsed batch: consumers that prune down to the group
        # key alone (df.count() over the census) would otherwise leave
        # the JSON scan referencing ONLY _corrupt_record, which Spark
        # rejects (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN
        # — found by the r7 profile sweep). Materializing the full row
        # once is also what a real quarantine pass does before fan-out.
        .transform(lineage_cut_lazy)
    )
    parsed = back.select(
        F.col("_corrupt_record").isNotNull().alias("is_corrupt"),
        F.coalesce(
            "doc_id",
            F.regexp_extract("_corrupt_record", r'"doc_id": (\d+)', 1).cast(
                "bigint"
            ),
        ).alias("doc_id"),
    )
    return parsed.groupBy("is_corrupt").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


@register(
    "s16_binaryfile_ingest",
    # Binary-file directory source: real GIF files on disk (written by
    # the repo's own LZW encoder, one per document) ingested with
    # spark.read.format("binaryFile") — the (path, length, content)
    # source a multimodal pipeline starts from — then doc ids parsed
    # from file NAMES and pixels decoded from file BYTES inside
    # mapInPandas. The oracle is the identity expectation off the
    # documents table: the decoded-pixel mean must equal each doc's
    # mean ASCII code point (the GIF roundtrip is lossless), proving
    # name parsing, content transport, and decode end-to-end.
    oracle="""
SELECT doc_id, 12 AS height, 8 AS width,
       (list_sum(list_transform(generate_series(1, 96),
                                i -> unicode(substr(t, i, 1))))::DOUBLE / 96)
         AS mean_byte,
       true AS is_valid
FROM (SELECT doc_id,
             substr(rpad(regexp_replace(text, '[^ -~]', '?', 'g'), 96, 'x'), 1, 96) AS t
      FROM documents)
""",
    doc="S16 binary-file directory source: per-doc GIF files written "
    "by executors (foreachPartition; on a cluster the target is "
    "shared storage), re-ingested via the binaryFile format source, "
    "doc ids regexp-parsed from paths, payloads decoded in Arrow "
    "batches. Completes the source matrix next to "
    "CSV/JSONL/ORC/XML/GeoJSON/fixed-width: the ingest shape used "
    "when the corpus arrives as a bucket of media objects rather "
    "than rows.",
    tags=("source", "multimodal", "extension"),
)
def s16_binaryfile_ingest(spark, sf_dir):
    import shutil
    from collections.abc import Iterator

    import pandas as pd

    docs = load(spark, sf_dir, "documents")
    tmp = os.path.join(
        tempfile.gettempdir(), "ast_binfiles", os.path.basename(sf_dir.rstrip("/"))
    )
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    ascii_text = F.regexp_replace(F.col("text"), "[^ -~]", "?")
    t96 = F.substring(F.rpad(ascii_text, 96, "x"), 1, 96)
    src = docs.select("doc_id", F.encode(t96, "utf-8").alias("raster"))

    def write_part(rows) -> None:
        import numpy as np

        from ast_data_pipeline_spark.operators.multimodal import encode_gif

        for r in rows:
            arr = np.frombuffer(bytes(r.raster), np.uint8).reshape(12, 8)
            with open(os.path.join(tmp, f"doc_{r.doc_id}.gif"), "wb") as f:
                f.write(encode_gif(arr))

    src.foreachPartition(write_part)
    back = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.gif")
        .load(tmp)
    )
    parsed = back.select(
        F.regexp_extract(F.col("path"), r"doc_(\d+)\.gif$", 1)
        .cast("long")
        .alias("doc_id"),
        "content",
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ast_data_pipeline_spark.operators.multimodal import _gif_decode

        for pdf in batches:
            if not len(pdf):
                continue
            out = {"doc_id": [], "height": [], "width": [], "mean_byte": [],
                   "is_valid": []}
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                arr = _gif_decode(bytes(content))
                out["doc_id"].append(int(doc_id))
                out["height"].append(int(arr.shape[0]))
                out["width"].append(int(arr.shape[1]))
                out["mean_byte"].append(float(arr.astype(np.float64).mean()))
                out["is_valid"].append(True)
            yield pd.DataFrame(out)

    return parsed.mapInPandas(
        decode, "doc_id long, height int, width int, mean_byte double, is_valid boolean"
    )


@register(
    "s17_hive_partitioned_roundtrip",
    # Hive-style partitioned dataset roundtrip: orders write
    # partitionBy(o_orderpriority) — the directory-per-value layout
    # every 100 TB lake table uses — and the read-back filters ONE
    # partition value, which must become partition PRUNING (directory
    # listing, not data scanning; the pytest in test_scale_knobs-style
    # plan checks is the partitionFilters line). The oracle is the
    # equivalent filtered projection off the parquet table. The
    # partition column comes back as a directory-derived string, so
    # the roundtrip also exercises partition-column type recovery.
    oracle="""
SELECT o_orderkey, o_custkey,
       round(o_totalprice, 2) AS totalprice_2dp,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       o_orderpriority
FROM orders
WHERE o_orderpriority = '1-URGENT'
""",
    doc="S17 hive-partitioned source/sink roundtrip: write orders "
    "partitioned by priority (directory-per-value), read back with a "
    "single-partition filter — the filter resolves at PLANNING time "
    "to a directory listing (PartitionFilters), so a 100 TB table "
    "scans only the selected partition's files. Completes the layout "
    "story next to bucketed materialization (bench) and Z-order "
    "(x_zorder_layout).",
    tags=("source", "extension"),
)
def s17_hive_partitioned_roundtrip(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    tmp = os.path.join(
        tempfile.gettempdir(), "ast_hive_part", os.path.basename(sf_dir.rstrip("/"))
    )
    (
        orders.select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        )
        .write.mode("overwrite")
        .partitionBy("o_orderpriority")
        .parquet(tmp)
    )
    back = spark.read.parquet(tmp).filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return back.select(
        "o_orderkey",
        "o_custkey",
        F.round("o_totalprice", 2).alias("totalprice_2dp"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        "o_orderpriority",
    )


@register(
    "s18_nested_json_explode",
    # Nested-document ingestion: each order renders as a JSON document
    # with an ARRAY OF LINEITEM STRUCTS (the API-payload / event-log
    # shape), written as JSONL, read back with an explicit nested
    # schema, and the items exploded back to rows. The oracle is the
    # flat join projection the roundtrip must reproduce — from_json
    # schema declaration, array-of-struct explode, and dotted-field
    # extraction all under the hash gate. Per-order item arrays are
    # sorted by linenumber on the WRITE side so array order is
    # deterministic before the explode.
    oracle="""
SELECT o.o_orderkey, o.o_orderstatus,
       l.l_linenumber::INT AS l_linenumber,
       l.l_partkey, round(l.l_quantity, 2) AS quantity_2dp
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey % 20 = 0
""",
    doc="S18 nested JSONL source: orders nest their lineitems as an "
    "array of structs (collect_list of sort_array'd structs on write "
    "— deterministic array order), re-read with a declared nested "
    "schema and exploded back to the flat relational shape the "
    "oracle computes directly. The document-database ingestion face "
    "next to flat JSONL (s12), corrupt-record quarantine (s15), and "
    "schema evolution (s14).",
    tags=("source", "extension"),
)
def s18_nested_json_explode(spark, sf_dir):
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 20 == 0)
    li = load(spark, sf_dir, "lineitem")
    items = F.struct(
        F.col("l_linenumber").cast("int").alias("l_linenumber"),
        F.col("l_partkey").alias("l_partkey"),
        F.round("l_quantity", 2).alias("quantity_2dp"),
    )
    nested = (
        li.join(orders.select("o_orderkey", "o_orderstatus"),
                li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_orderstatus")
        .agg(F.sort_array(F.collect_list(items)).alias("items"))
    )
    doc = F.to_json(F.struct("o_orderkey", "o_orderstatus", "items"))
    tmp = os.path.join(
        tempfile.gettempdir(), "ast_nested_jsonl", os.path.basename(sf_dir.rstrip("/"))
    )
    nested.select(doc.alias("value")).write.mode("overwrite").text(tmp)
    schema = (
        "o_orderkey bigint, o_orderstatus string, "
        "items array<struct<l_linenumber:int, l_partkey:bigint, "
        "quantity_2dp:double>>"
    )
    back = spark.read.schema(schema).json(tmp)
    return back.select(
        "o_orderkey",
        "o_orderstatus",
        F.explode("items").alias("it"),
    ).select(
        "o_orderkey",
        "o_orderstatus",
        F.col("it.l_linenumber").alias("l_linenumber"),
        F.col("it.l_partkey").alias("l_partkey"),
        F.col("it.quantity_2dp").alias("quantity_2dp"),
    )


@register(
    "s19_shapefile_zip_roundtrip",
    # S4 closed for real: the reference's county layer arrives as a
    # ZIPPED shapefile (ref src/az_proc.py county loads via unzipped
    # .shp); through r7 the repo scanned a parquet-backed counties
    # view instead (declared partial). Now the counties dimension is
    # WRITTEN as a real binary shapefile (the K4 writer: ESRI-spec
    # .shp/.shx/.dbf/.prj), zipped with stdlib zipfile, and READ BACK
    # by the repo's own binary parsers (read_shp/read_dbf in
    # sources/shapefile.py — no geopandas), then compared field-for-
    # field and COORDINATE-for-coordinate against the source view.
    # Coordinates survive bit-exactly: county corners are integer-
    # valued doubles, so the %.9f WKT render -> float parse -> binary
    # IEEE write -> read -> %.9f re-render chain is the identity, and
    # the oracle mirrors the same %.9f rendering off the counties CTE.
    # Driver-side parse by design — shapefiles are dimension-table
    # scale (the read frame then BROADCASTS into spatial joins);
    # fact-scale binary ingest is s16's binaryFile+mapInPandas path.
    # Ring order mirrors the ESRI winding rule the WRITER enforces
    # (outer rings clockwise, _ring_clockwise): bbox_wkt's CCW ring
    # comes back reversed — (minx miny, minx maxy, maxx maxy,
    # maxx miny, close). The oracle renders that spec'd order.
    oracle=with_domain(
        """
SELECT state_fips, county_fips, county_name,
       'POLYGON ((' || printf('%.9f', c_minx) || ' ' || printf('%.9f', c_miny)
        || ', ' || printf('%.9f', c_minx) || ' ' || printf('%.9f', c_maxy)
        || ', ' || printf('%.9f', c_maxx) || ' ' || printf('%.9f', c_maxy)
        || ', ' || printf('%.9f', c_maxx) || ' ' || printf('%.9f', c_miny)
        || ', ' || printf('%.9f', c_minx) || ' ' || printf('%.9f', c_miny)
        || '))' AS geometry_wkt
FROM counties
""",
        "counties",
    ),
    doc="S4 zipped-shapefile scan, real binary path: counties written "
    "as an ESRI shapefile, zipped, parsed back by from-scratch "
    ".shp/.dbf readers, and verified attribute- and coordinate-exact "
    "against the source view (DBF 10-char name truncation reversed "
    "on the way out). The read frame is dimension-sized and "
    "broadcasts into the J6/J8 spatial joins.",
    tags=("source", "spatial", "extension"),
)
def s19_shapefile_zip_roundtrip(spark, sf_dir):
    import zipfile

    from ..functions.geo import bbox_wkt
    from ..sources.shapefile import read_shapefile_zip, write_shapefile

    cts = counties(spark, sf_dir).select(
        "county_name",
        "state_fips",
        "county_fips",
        bbox_wkt(
            F.col("c_minx"), F.col("c_miny"), F.col("c_maxx"), F.col("c_maxy")
        ).alias("geometry_wkt"),
    )
    base = os.path.join(
        tempfile.gettempdir(),
        "ast_shp_zip",
        os.path.basename(sf_dir.rstrip("/")),
        "counties",
    )
    os.makedirs(os.path.dirname(base), exist_ok=True)
    write_shapefile(cts, base)
    zpath = base + ".zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for ext in (".shp", ".shx", ".dbf", ".prj"):
            z.write(base + ext, "counties" + ext)
    back = read_shapefile_zip(spark, zpath)
    # reverse the DBF 10-char field-name truncation
    return back.select(
        "state_fips",
        F.col("county_fip").alias("county_fips"),
        F.col("county_nam").alias("county_name"),
        "geometry_wkt",
    )


@register(
    "k6_jpeg_chip_sink",
    # K6 closed for real: the reference's chip sink is cv2.imwrite of
    # .jpg files named by image_name (ref src/az_proc.py:524); through
    # r7 this was declared out of scope (no codec in the container).
    # With the r8 baseline JPEG codec the sink is now real: a
    # deterministic ~1% slice of the images view (tile_key % 97 == 0 —
    # a pushed-down filter, no global sort) renders each chip's
    # 96-char name-derived raster as constant 8x8 blocks, executors
    # write real {image_name}.jpg files (foreachPartition; shared
    # storage on a cluster), and the directory is re-ingested via
    # binaryFile, names parsed from paths, pixels decoded by the
    # general baseline decoder. Constant blocks + all-ones quant make
    # the chain lossless, so the decoded-pixel mean equals the mean
    # code point of the name string, which DuckDB computes
    # independently off the images CTE.
    oracle=with_domain(
        """
SELECT image_name, 8 AS height, 768 AS width,
       (list_sum(list_transform(generate_series(1, 96),
                                i -> unicode(substr(t, i, 1))))::DOUBLE / 96)
         AS mean_byte,
       true AS is_valid
FROM (SELECT image_name,
             substr(rpad(image_name, 96, 'x'), 1, 96) AS t
      FROM images WHERE tile_key % 97 = 0)
""",
        "images",
    ),
    doc="K6 JPEG chip sink, real binary path: per-chip baseline JFIF "
    "files written by executors and re-ingested via binaryFile, with "
    "path-parsed ids and a real DCT decode verifying every file "
    "byte-for-byte against the oracle's independent expectation. "
    "Completes the sink matrix: every binary artifact the reference "
    "emits (XML, GeoJSON, shapefile, npy work-queue, JPEG chips) now "
    "has a working from-scratch writer.",
    tags=("sink", "multimodal", "extension"),
)
def k6_jpeg_chip_sink(spark, sf_dir):
    import shutil
    from collections.abc import Iterator

    import pandas as pd

    chips = (
        images(spark, sf_dir)
        .filter(F.col("tile_key") % 97 == 0)
        .select(
            "image_name",
            F.encode(
                F.substring(F.rpad(F.col("image_name"), 96, "x"), 1, 96), "utf-8"
            ).alias("raster"),
        )
    )
    tmp = os.path.join(
        tempfile.gettempdir(), "ast_jpeg_chips", os.path.basename(sf_dir.rstrip("/"))
    )
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)

    def write_part(rows) -> None:
        import numpy as np

        from ast_data_pipeline_spark.operators.multimodal import encode_jpeg

        for r in rows:
            arr = np.tile(
                np.repeat(np.frombuffer(bytes(r.raster), np.uint8), 8)[None, :],
                (8, 1),
            )
            with open(os.path.join(tmp, f"{r.image_name}.jpg"), "wb") as f:
                f.write(encode_jpeg(arr))

    chips.foreachPartition(write_part)
    back = (
        spark.read.format("binaryFile").option("pathGlobFilter", "*.jpg").load(tmp)
    )
    parsed = back.select(
        F.regexp_extract(F.col("path"), r"([^/]+)\.jpg$", 1).alias("image_name"),
        "content",
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ast_data_pipeline_spark.operators.multimodal import _jpeg_decode

        for pdf in batches:
            if not len(pdf):
                continue
            out = {"image_name": [], "height": [], "width": [], "mean_byte": [],
                   "is_valid": []}
            for name, content in zip(pdf["image_name"], pdf["content"]):
                arr = _jpeg_decode(bytes(content))
                out["image_name"].append(name)
                out["height"].append(int(arr.shape[0]))
                out["width"].append(int(arr.shape[1]))
                out["mean_byte"].append(float(arr.astype(np.float64).mean()))
                out["is_valid"].append(True)
            yield pd.DataFrame(out)

    return parsed.mapInPandas(
        decode,
        "image_name string, height int, width int, mean_byte double, is_valid boolean",
    )


@register(
    "s20_shapefile_datasource",
    # The S4 reader surfaced as a FIRST-CLASS Spark format via the
    # Spark 4 Python DataSource API: spark.read.format("shapefile")
    # .load(...) — schema inferred from the DBF field descriptors at
    # planning time, records produced executor-side by the repo's own
    # binary parsers (sources/pyds_shapefile.py wrapping read_shp/
    # read_dbf). Same identity oracle as s19: the scan must be
    # attribute- and coordinate-exact against the source view. One
    # partition by design (a shapefile is a dimension format — the
    # frame broadcasts); the API face is the point: a reference user
    # gets shapefiles next to parquet/csv/orc in the reader matrix.
    oracle=with_domain(
        """
SELECT state_fips, county_fips, county_name,
       'POLYGON ((' || printf('%.9f', c_minx) || ' ' || printf('%.9f', c_miny)
        || ', ' || printf('%.9f', c_minx) || ' ' || printf('%.9f', c_maxy)
        || ', ' || printf('%.9f', c_maxx) || ' ' || printf('%.9f', c_maxy)
        || ', ' || printf('%.9f', c_maxx) || ' ' || printf('%.9f', c_miny)
        || ', ' || printf('%.9f', c_minx) || ' ' || printf('%.9f', c_miny)
        || '))' AS geometry_wkt
FROM counties
""",
        "counties",
    ),
    doc="Shapefile as a registered Spark data source (Spark 4 Python "
    "DataSource API): spark.read.format('shapefile') over the "
    "written counties set, schema from DBF descriptors, coordinate-"
    "exact against the source view — the from-scratch binary parsers "
    "promoted to a first-class format.",
    tags=("source", "spatial", "extension"),
)
def s20_shapefile_datasource(spark, sf_dir):
    from ..functions.geo import bbox_wkt
    from ..sources.pyds_shapefile import register_shapefile_source
    from ..sources.shapefile import write_shapefile

    cts = counties(spark, sf_dir).select(
        "county_name",
        "state_fips",
        "county_fips",
        bbox_wkt(
            F.col("c_minx"), F.col("c_miny"), F.col("c_maxx"), F.col("c_maxy")
        ).alias("geometry_wkt"),
    )
    base = os.path.join(
        tempfile.gettempdir(),
        "ast_pyds_shp",
        os.path.basename(sf_dir.rstrip("/")),
        "counties",
    )
    os.makedirs(os.path.dirname(base), exist_ok=True)
    write_shapefile(cts, base)
    register_shapefile_source(spark)
    back = spark.read.format("shapefile").load(base + ".shp")
    return back.select(
        "state_fips",
        F.col("county_fip").alias("county_fips"),
        F.col("county_nam").alias("county_name"),
        "geometry_wkt",
    )


@register(
    "s21_shapefile_sink_format",
    # Both halves of the shapefile story as REGISTERED Spark formats:
    # df.write.format("shapefile").save(base) runs the Spark 4 Python
    # DataSource writer (per-partition rows travel in commit messages
    # — sane exactly because shapefiles are dimension-scale, enforced
    # by the same MAX_REPORT_ROWS cap as the function sink), and the
    # read-back goes through the registered reader. Identity oracle
    # as s19/s20 — the format pair must be coordinate-exact.
    oracle=with_domain(
        """
SELECT state_fips, county_fips, county_name,
       'POLYGON ((' || printf('%.9f', c_minx) || ' ' || printf('%.9f', c_miny)
        || ', ' || printf('%.9f', c_minx) || ' ' || printf('%.9f', c_maxy)
        || ', ' || printf('%.9f', c_maxx) || ' ' || printf('%.9f', c_maxy)
        || ', ' || printf('%.9f', c_maxx) || ' ' || printf('%.9f', c_miny)
        || ', ' || printf('%.9f', c_minx) || ' ' || printf('%.9f', c_miny)
        || '))' AS geometry_wkt
FROM counties
""",
        "counties",
    ),
    doc="Shapefile WRITE as a registered Spark format (Python "
    "DataSource writer; rows via commit messages, one file assembled "
    "at commit) followed by the registered reader — the K4/S4 pair "
    "promoted to df.write.format / spark.read.format symmetry, "
    "verified coordinate-exact.",
    tags=("sink", "source", "spatial", "extension"),
)
def s21_shapefile_sink_format(spark, sf_dir):
    from ..functions.geo import bbox_wkt
    from ..sources.pyds_shapefile import register_shapefile_source

    register_shapefile_source(spark)
    cts = counties(spark, sf_dir).select(
        "county_name",
        "state_fips",
        "county_fips",
        bbox_wkt(
            F.col("c_minx"), F.col("c_miny"), F.col("c_maxx"), F.col("c_maxy")
        ).alias("geometry_wkt"),
    )
    base = os.path.join(
        tempfile.gettempdir(),
        "ast_pyds_shp_sink",
        os.path.basename(sf_dir.rstrip("/")),
        "counties",
    )
    os.makedirs(os.path.dirname(base), exist_ok=True)
    cts.write.format("shapefile").mode("append").save(base)
    back = spark.read.format("shapefile").load(base + ".shp")
    return back.select(
        "state_fips",
        F.col("county_fip").alias("county_fips"),
        F.col("county_nam").alias("county_name"),
        "geometry_wkt",
    )


@register(
    "s23_partitioned_datasource",
    # The PARALLEL-READ face of the Spark 4 Python DataSource API:
    # s20's shapefile reader is single-partition by design (dimension
    # format); this source implements ``partitions()`` — the event-id
    # key space splits into 8 ranges, each range read by its own
    # executor task (verified: the scan runs 8 tasks). The census over
    # the parallel read must equal SQL over the parquet directly —
    # proving the partitions compose to exactly-once coverage
    # (disjoint ranges, no overlap, no gap).
    oracle="""
SELECT event_type,
       count(*)::BIGINT AS n_events,
       min(event_id)::BIGINT AS min_id,
       max(event_id)::BIGINT AS max_id,
       round(sum(value::DECIMAL(30,10)), 4)::DOUBLE AS total_value
FROM events GROUP BY event_type
""",
    doc="Partitioned Python DataSource batch read: an 8-way id-range "
    "partitions() split, each range read by its own task with a "
    "pyarrow filter — the parallel-read face of the DataSource API, "
    "with the census hash-gated against direct SQL to prove "
    "exactly-once range coverage.",
    tags=("sources", "extension"),
)
def s23_partitioned_datasource(spark, sf_dir):
    from ..functions.exact import dsum
    from ..sources.catalog import table_path
    from ..sources.pyds_shapefile import register_event_ranges_source

    register_event_ranges_source(spark)
    df = (
        spark.read.format("event_ranges")
        .option("path", table_path(sf_dir, "events"))
        .option("n_partitions", "8")
        .load()
    )
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("event_id").cast("long").alias("min_id"),
        F.max("event_id").cast("long").alias("max_id"),
        dsum("value").alias("total_value"),
    )


@register(
    "s24_datasource_stream_sink",
    # The streaming WRITE face of the Python DataSource API (16th
    # streaming face; s22 is the matching custom stream READER): the
    # purchase stream is written through a custom jsonl sink whose
    # executor write() stages uniquely-named files and whose driver
    # commit(batchId) renames them to deterministic batch{id}-{i}
    # names — the classic exactly-once file-commit protocol, pure I/O
    # on both sides (no session anywhere near commit, the s21 lesson).
    # The directory read back must equal the batch projection — which
    # simultaneously proves no row was lost, duplicated, or left in
    # staging.
    oracle="""
SELECT event_id, user_id, event_type, value
FROM events WHERE event_type = 'purchase'
""",
    doc="Custom streaming sink via the Python DataSource stream-writer "
    "API: staged-file write() + atomic batch-rename commit(batchId) — "
    "the exactly-once file protocol as a first-class sink; round-trip "
    "hash-gated against the batch projection.",
    tags=("streaming", "sources", "extension"),
)
def s24_datasource_stream_sink(spark, sf_dir):
    import shutil
    import time

    from ..sources.catalog import table_path
    from ..sources.pyds_shapefile import register_jsonl_sink

    import uuid

    register_jsonl_sink(spark)
    # unique dir PER CALL: two concurrent drivers (pytest + a full
    # sweep) sharing one path raced on the rmtree (caught r9). Unique
    # dirs accumulate across bench sweeps / pytest / driver grading,
    # so prune stale siblings first (r9 ADVICE). Cutoff is 24h, not
    # 1h (r10 ADVICE): a full sweep on a loaded box can legitimately
    # run longer than an hour, and its returned DataFrame lazily
    # re-reads batch*.jsonl — pruning a live run's dir mid-compare
    # would corrupt the gate. Nothing on this box runs for a day.
    parent = os.path.join(tempfile.gettempdir(), "ast_ds_stream_sink")
    if os.path.isdir(parent):
        cutoff = time.time() - 86400
        for child in os.listdir(parent):
            p = os.path.join(parent, child)
            try:
                if os.path.getmtime(p) < cutoff:
                    shutil.rmtree(p, ignore_errors=True)
            except OSError:
                pass  # concurrently removed by another run
    out_dir = os.path.join(
        parent,
        os.path.basename(sf_dir.rstrip("/")) + "_" + uuid.uuid4().hex[:8],
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    schema = spark.read.parquet(table_path(sf_dir, "events")).schema
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "event_type", "value")
    )
    ckpt = os.path.join(out_dir, "_checkpoint")
    q = (
        stream.writeStream.format("jsonl_sink")
        .option("out_dir", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    back_schema = "event_id bigint, user_id bigint, event_type string, value double"
    return spark.read.schema(back_schema).json(
        os.path.join(out_dir, "batch*.jsonl")
    )
