"""Ship this package to Spark's Python workers.

The engine's pandas-UDF operators (merge, reprojection, multimodal
features) are module-level functions, so cloudpickle serializes them
by reference — workers must be able to ``import
ast_data_pipeline_spark``. When the driver process runs from outside
the repo (exactly what the verification driver does), the package is
not on the workers' path. ``ensure_shipped`` zips the package once
per process and registers it with ``sc.addPyFile``, which puts it on
every worker's sys.path — the same mechanism used to ship job code to
a real cluster.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[int] = set()


def ensure_session_confs(spark: SparkSession) -> None:
    """Correctness-critical runtime confs, set defensively because the
    verification driver runs queries on its own SparkSession:
    - UTC session TZ (timestamp formatting must match the DuckDB oracle)
    - nanos-as-long legacy read (events.parquet is TIMESTAMP(NANOS))
    - AQE on (safe, runtime-settable; performance only)
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")


def ensure_shipped(spark: SparkSession) -> None:
    # confs are per-SESSION (a driver may hand us a sibling session on
    # the same context) — set them on every call; they're cheap.
    ensure_session_confs(spark)
    key = id(spark.sparkContext)
    if key in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    # Collect sources deterministically and name the zip by CONTENT
    # hash, not pid: pid-named zips outlive their process, and pid
    # reuse then ships a stale snapshot of the package (r12: a reused
    # pid resurrected a zip from an earlier session mid-edit). A hash
    # name is immune — same content reuses the file, changed content
    # gets a fresh name. Written via tmp+rename so a concurrent
    # process producing the same hash never exposes a partial file.
    entries: list[tuple[str, str]] = []
    hasher = hashlib.sha1()
    for root, dirs, files in sorted(
        (r, d, f) for r, d, f in os.walk(pkg_dir)
    ):
        if "__pycache__" in root:
            continue
        for f in sorted(files):
            if not f.endswith((".py", ".txt")):
                continue
            full = os.path.join(root, f)
            rel = os.path.join(pkg_name, os.path.relpath(full, pkg_dir))
            entries.append((full, rel))
            hasher.update(rel.encode())
            with open(full, "rb") as fh:
                hasher.update(fh.read())
    zip_path = os.path.join(
        tempfile.gettempdir(), f"{pkg_name}_{hasher.hexdigest()[:12]}.zip"
    )
    if not os.path.exists(zip_path):
        tmp_fd, tmp_path = tempfile.mkstemp(
            suffix=".zip", dir=tempfile.gettempdir()
        )
        os.close(tmp_fd)
        with zipfile.ZipFile(tmp_path, "w", zipfile.ZIP_DEFLATED) as zf:
            for full, rel in entries:
                zf.write(full, rel)
        os.replace(tmp_path, zip_path)
    spark.sparkContext.addPyFile(zip_path)
    _SHIPPED.add(key)
