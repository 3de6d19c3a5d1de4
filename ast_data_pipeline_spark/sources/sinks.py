"""Sinks (SURVEY.md §2.1 K1/K2/K4/K5).

- K1 CSV report sink: tiny report tables -> single CSV (the reference
  writes pandas .to_csv; we coalesce(1) since reports are small by
  construction — never used for large outputs).
- K2 queue snapshot: parquet overwrite keyed by round (replaces the
  reference's np.save, src/az_proc.py:408-445).
- K4 inventory export: JSON with geometry as WKT, plus the
  shapefile-compatible variant with 10-char truncated column names —
  the reference's ESRI shapefile sink truncates ``object_class`` ->
  ``object_cla`` etc. (seen at distribution_by_county_state.py:29,32);
  emitted as a documented legacy-compat artifact.
- K5 JSON list sink (ref: src/form_calcs.py:54-65).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# Hard bound on what the single-file CSV path will serialize through one
# task. Reports here are group-by summaries (tens to thousands of rows);
# anything bigger indicates a caller routing a fact table at a report
# sink, which at 100 TB would funnel the job through one executor —
# fail fast instead.
MAX_REPORT_ROWS = 1_000_000


def write_csv_report(df: DataFrame, path: str) -> None:
    n = df.limit(MAX_REPORT_ROWS + 1).count()
    if n > MAX_REPORT_ROWS:
        raise ValueError(
            f"write_csv_report: {n}+ rows exceeds MAX_REPORT_ROWS="
            f"{MAX_REPORT_ROWS}; use write_queue_snapshot (parquet, "
            "parallel) for large outputs"
        )
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(path)


def write_queue_snapshot(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").parquet(path)


def shapefile_compat_names(names: list[str]) -> list[str]:
    """The DBF 10-char truncate + ESRI-style numeric-suffix dedup as a
    pure name transform — shared by the Spark-side
    ``shapefile_compat_columns`` and the row-level shapefile writer
    (``shapefile.write_shapefile_rows``), which must not touch Spark."""
    seen: dict[str, int] = {}
    out = []
    for name in names:
        short = name[:10]
        if short in seen:
            seen[short] += 1
            suffix = str(seen[short])
            short = short[: 10 - len(suffix)] + suffix
        else:
            seen[short] = 0
        out.append(short)
    return out


def shapefile_compat_columns(df: DataFrame) -> DataFrame:
    """Truncate column names to the DBF 10-char limit, deduplicating
    with numeric suffixes the way ESRI writers do; drops list-typed
    columns (shapefiles cannot carry them — the reference's shp sink
    drops ``image_name`` the same way)."""
    out = df
    for name, dtype in df.dtypes:
        if dtype.startswith("array"):
            out = out.drop(name)
    renames = list(zip(out.columns, shapefile_compat_names(out.columns)))
    # One select with aliases, NOT sequential withColumnRenamed: the
    # sequential form renames every column matching the name, so
    # truncating A -> B while an original B exists clobbered both.
    return out.select([F.col(f"`{old}`").alias(new) for old, new in renames])


def write_inventory_json(inv: DataFrame, path: str, shp_compat_path: str | None = None) -> None:
    """K4: full-fidelity JSON (WKT geometry, list columns intact); and
    optionally the shapefile-compatible truncated flavor."""
    inv.write.mode("overwrite").json(path)
    if shp_compat_path:
        shapefile_compat_columns(inv).write.mode("overwrite").json(shp_compat_path)


def write_json_list(values: list, path: str) -> None:
    """K5: a plain JSON list (driver-side tiny artifact)."""
    with open(path, "w") as f:
        json.dump(values, f)


def write_geojson(df: DataFrame, path: str, geometry: str = "geometry_wkt") -> int:
    """GeoJSON FeatureCollection from a DataFrame with a single-ring
    POLYGON WKT column — the reference emits its inventory as
    ``gdf.to_json()`` (a FeatureCollection) under BOTH the ``.json``
    and ``.geojson`` names (ref: src/form_calcs.py:1040-1052). All
    non-geometry columns become feature properties; list columns ride
    along intact (GeoJSON, unlike DBF, can carry them). Driver-side
    report sink, bounded by MAX_REPORT_ROWS. Returns feature count."""
    from .shapefile import parse_polygon_wkt

    pdf = df.limit(MAX_REPORT_ROWS + 1).toPandas()
    if len(pdf) > MAX_REPORT_ROWS:
        raise ValueError(
            f"write_geojson: >{MAX_REPORT_ROWS} rows; GeoJSON is a "
            "report-scale hand-off, keep fact-scale data in parquet"
        )
    props = [c for c in pdf.columns if c != geometry]
    features = [
        {
            "type": "Feature",
            "geometry": {
                "type": "Polygon",
                "coordinates": [
                    [[x, y] for x, y in parse_polygon_wkt(row[geometry])]
                ],
            },
            "properties": {
                c: (row[c].tolist() if hasattr(row[c], "tolist") else row[c])
                for c in props
            },
        }
        for _, row in pdf.iterrows()
    ]
    with open(path, "w") as f:
        json.dump({"type": "FeatureCollection", "features": features}, f)
    return len(features)


def export_inventory(
    inv: DataFrame,
    output_dir: str,
    name: str = "tile_level_annotations",
    geometry: str = "geometry_wkt",
) -> dict[str, int]:
    """K4 complete hand-off, mirroring the reference's ``write_gdf``
    (src/form_calcs.py:1040-1055): ``{name}.json`` and
    ``{name}.geojson`` (both the GeoJSON FeatureCollection, as
    ``gdf.to_json()`` writes), and ``{name}.shp/.shx/.dbf/.prj`` (list
    columns dropped, 10-char DBF names — the constraints the
    reference's geopandas ``to_file`` applies). Returns per-artifact
    row counts."""
    import os

    from .shapefile import write_shapefile

    os.makedirs(output_dir, exist_ok=True)
    base = os.path.join(output_dir, name)
    n_json = write_geojson(inv, base + ".json", geometry)
    n_geo = write_geojson(inv, base + ".geojson", geometry)
    n_shp = write_shapefile(inv, base, geometry)
    return {"json": n_json, "geojson": n_geo, "shp": n_shp}
