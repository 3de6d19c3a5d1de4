"""Readers (SURVEY.md §2.1 S1/S3/S5).

- S1  CSV scan with variant-schema resolution (ref: src/az_proc.py:
      275-290 — sheets arrive with either ``X,Y`` or
      ``LONGITUDE,LATITUDE`` columns; anything else is rejected).
- S3  Pascal-VOC XML ingestion via JVM xpath built-ins (ref:
      src/az_proc.py:793-819, src/form_calcs.py:861-879) — documents
      become one row per <object>, no Python in the path.
- S5  GeoJSON feature flattening (ref: distribution_by_county_state.py:
      27) — FeatureCollection -> one row per feature with properties
      and geometry columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

COORD_VARIANTS = (("X", "Y"), ("LONGITUDE", "LATITUDE"))


def read_points_csv(spark: SparkSession, path: str) -> DataFrame:
    """S1/F3: header CSV with either X/Y or LONGITUDE/LATITUDE columns,
    normalized to ``lon``/``lat``. Raises on an unknown variant, like
    the reference skips unknown sheets."""
    df = spark.read.option("header", True).csv(path)
    cols = set(df.columns)
    for cx, cy in COORD_VARIANTS:
        if {cx, cy} <= cols:
            return df.withColumn("lon", F.col(cx).cast("double")).withColumn(
                "lat", F.col(cy).cast("double")
            )
    raise ValueError(
        f"CSV at {path} has none of the coordinate variants {COORD_VARIANTS}; "
        f"columns={sorted(cols)}"
    )


# ---- Pascal-VOC XML ----------------------------------------------------

def voc_xml_doc(image_name: Column, objects_xml: Column) -> Column:
    """Assemble a VOC-style document from an image name and
    pre-rendered <object> fragments (K3's inverse)."""
    return F.concat(
        F.lit("<annotation><filename>"),
        image_name,
        F.lit("</filename>"),
        objects_xml,
        F.lit("</annotation>"),
    )


def voc_object_fragment(
    name: Column, truncated: Column, difficult: Column,
    xmin: Column, ymin: Column, xmax: Column, ymax: Column,
) -> Column:
    return F.concat(
        F.lit("<object><name>"), name, F.lit("</name><truncated>"),
        truncated.cast("string"), F.lit("</truncated><difficult>"),
        difficult.cast("string"), F.lit("</difficult><bndbox><xmin>"),
        xmin.cast("string"), F.lit("</xmin><ymin>"), ymin.cast("string"),
        F.lit("</ymin><xmax>"), xmax.cast("string"), F.lit("</xmax><ymax>"),
        ymax.cast("string"), F.lit("</ymax></bndbox></object>"),
    )


_VOC_SCHEMA = (
    "filename STRING, object ARRAY<STRUCT<name: STRING, truncated: INT, "
    "difficult: INT, bndbox: STRUCT<xmin: INT, ymin: INT, xmax: INT, ymax: INT>>>"
)


def parse_voc_xml(docs: DataFrame, xml_col: str = "xml") -> DataFrame:
    """S3: one VOC document per row -> one row per <object>, via
    ``from_xml`` (Spark 4): ONE parse per document into a typed
    struct. The earlier xpath formulation evaluated 8 xpath
    expressions per doc — 8 full XML re-parses per row — and was 5x
    slower at sf0.1 (73 s -> this form); per-field re-parse is exactly
    the reference's add_objects anti-pattern (src/form_calcs.py:593-637)
    reappearing at the expression level.

    Output: image_name, raw_label, truncated, difficult,
    xmin/ymin/xmax/ymax (ints, chip-local 1-indexed like the source).
    """
    # ignoreSurroundingSpaces=false: the reference's label variants
    # include trailing-space forms ('water_tower ') that the P15
    # standardization must see verbatim — the XML default would trim
    # them and silently pre-clean the data.
    parsed = docs.select(
        F.from_xml(
            xml_col, _VOC_SCHEMA, {"ignoreSurroundingSpaces": "false"}
        ).alias("a")
    )
    o = parsed.select(
        F.col("a.filename").alias("image_name"), F.explode("a.object").alias("o")
    )
    return o.select(
        "image_name",
        F.col("o.name").alias("raw_label"),
        F.col("o.truncated").alias("truncated"),
        F.col("o.difficult").alias("difficult"),
        F.col("o.bndbox.xmin").alias("xmin"),
        F.col("o.bndbox.ymin").alias("ymin"),
        F.col("o.bndbox.xmax").alias("xmax"),
        F.col("o.bndbox.ymax").alias("ymax"),
    )


# ---- GeoJSON -----------------------------------------------------------

def flatten_geojson_features(fc: DataFrame, fc_col: str = "feature_json") -> DataFrame:
    """S5: parse GeoJSON Feature strings -> flat property/geometry cols."""
    schema = (
        "struct<type string, "
        "properties struct<county_name string, state_fips string, county_fips string>, "
        "geometry struct<type string, bbox array<double>>>"
    )
    f = fc.withColumn("f", F.from_json(F.col(fc_col), schema))
    return f.select(
        F.col("f.properties.county_name").alias("county_name"),
        F.col("f.properties.state_fips").alias("state_fips"),
        F.col("f.properties.county_fips").alias("county_fips"),
        F.element_at("f.geometry.bbox", 1).alias("c_minx"),
        F.element_at("f.geometry.bbox", 2).alias("c_miny"),
        F.element_at("f.geometry.bbox", 3).alias("c_maxx"),
        F.element_at("f.geometry.bbox", 4).alias("c_maxy"),
    )
