"""Materialize the shared domain views as bucketed parquet tables.

The session-scope cache in ``domain_views._memo`` is the batch-sweep
optimization; THIS is the cluster-scale counterpart promised in
SCALING.md: write each derived view once, bucketed (and sorted) by
``tile_key``, so every downstream groupBy/join on the tile key — the
merge (A1), per-tile stats (A7), tracking joins (J9), the flagship —
reads pre-partitioned data and runs shuffle-free (verified by plan
assertion in tests/test_materialize.py).

The reference re-derives its tile-level frames per script run
(src/form_calcs.py builds the tile_level_annotations GeoDataFrame from
scratch each time); at 100 TB that re-derivation is the dominant cost,
and a one-time bucketed materialization amortizes it across every
consumer. Bucket count is a knob: ~(fact size / 128 MB) at the target
scale; the local default keeps test tables small.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from . import domain_views as DV

# Views keyed (and therefore bucketed) by tile_key. counties is a
# 25-row dimension locally (~3.2k real-world) — always broadcast-size,
# never worth bucketing.
_BUCKETED = ("tiles", "images", "annotations", "gann")


def materialize_domain_views(
    spark: SparkSession,
    sf_dir: str,
    *,
    buckets: int = 8,
    prefix: str = "mat_",
) -> dict[str, str]:
    """Write tiles/images/annotations/gann as bucketed+sorted tables
    (``{prefix}{view}`` in the session catalog). Returns view -> table
    name. Raw (uncached) lineage is used for the writes so the job
    plans the full pipeline once instead of reading a session cache."""
    out: dict[str, str] = {}
    # CASCADE: _BUCKETED is dependency order, and inside
    # materialized_views() each builder resolves its upstream views
    # from the tables already written this loop — annotations builds
    # from mat_tiles, gann from mat_annotations + mat_tiles (a
    # bucket-co-located, shuffle-free join) — instead of re-deriving
    # the whole raw lineage per view. Only the leaf (tiles) reads raw
    # parquet. The target table is dropped first so a same-session
    # rebuild can't read itself as its own source.
    with DV.uncached_views(), DV.materialized_views(prefix):
        for view in _BUCKETED:
            table = f"{prefix}{view}"
            spark.sql(f"DROP TABLE IF EXISTS {table}")
            _clear_stale_location(spark, table)
            (
                # Cluster on the BUCKET KEY before the bucketed write
                # (guide §6 "small files hurt twice"): the bucketBy
                # writer emits one file per (task, bucket) pair, so a
                # builder that arrives partitioned on anything else
                # fans out to tasks x buckets tiny files — r14's
                # dedup_floor left annotations 32-way partitioned on
                # the dedup columns and mat_annotations ballooned to
                # 1025 files / mat_gann to 539, doubling every
                # consumer's scan input bytes (the SHUFFLE.md r14
                # input-MB regression). repartition uses the same
                # murmur3 hash as the bucket assignment, so each task
                # holds exactly one bucket and writes exactly one
                # file; the extra exchange is part of the one-time
                # amortized build, not any query's timed path.
                DV.BUILDERS[view](spark, sf_dir)
                .repartition(buckets, "tile_key")
                .write.mode("overwrite")
                .bucketBy(buckets, "tile_key")
                .sortBy("tile_key")
                .saveAsTable(table)
            )
            out[view] = table
    return out


def _clear_stale_location(spark: SparkSession, table: str) -> None:
    """Remove a warehouse directory left by a PREVIOUS session.

    The local in-memory catalog forgets tables when the session ends,
    but their managed locations stay on disk — and saveAsTable refuses
    to claim an existing location it has no catalog entry for
    (LOCATION_ALREADY_EXISTS). Only relevant to repeated local runs;
    a persistent metastore resolves the table and overwrite handles it.
    """
    if spark.catalog.tableExists(table):
        return  # same-session rebuild: overwrite mode handles it
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    loc = os.path.join(wh, table.lower())
    if os.path.isdir(loc):
        shutil.rmtree(loc)


def read_materialized(spark: SparkSession, view: str, prefix: str = "mat_") -> DataFrame:
    """Read a materialized view; carries the bucketing spec, so joins
    and aggregations on tile_key skip their shuffle."""
    return spark.table(f"{prefix}{view}")


def drop_materialized(spark: SparkSession, prefix: str = "mat_") -> None:
    for view in _BUCKETED:
        spark.sql(f"DROP TABLE IF EXISTS {prefix}{view}")
