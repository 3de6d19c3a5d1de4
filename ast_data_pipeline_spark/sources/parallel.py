"""Input-layout remediation: a scan-parallelism floor for degenerate
parquet layouts (guide §2.5 "input skew — one huge unsplittable file
... otherwise repartition immediately after the read").

Parquet readers cannot parallelize *within* a row group: Spark assigns
each row group to the scan task whose byte-range split contains its
midpoint, so a file written as one giant row group caps the whole scan
stage — and everything whole-stage-fused into it (filters, broadcast
probes, partial aggregation) — at ``row_group_count`` tasks no matter
how many cores the session has. The driver's testdata is exactly this
shape (one row group per table at every SF), so e.g. the Q1-style
full-table multi-aggregate ran its 600k-row decimal aggregation on ONE
of 32 cores (measured 1.20 s -> 0.61 s at sf0.1 with the floor).

The floor is gated on the *actual footer metadata*, not on scale
factor or core count: if the table's files already expose at least
half the session's default parallelism in row groups, the input is
well laid out and the DataFrame is returned untouched. On a 100 TB
warehouse (row groups ~128 MB) the gate never fires, so this is not a
local-mode tuning knob — it is the §2.5 remedy for pathological input
layout, made self-disabling on healthy layout.

The repartition hashes the table's unique key (deterministic under
task retry — guide §2.5 warns keyless round-robin both re-sorts its
input and can duplicate/lose rows on fetch-failure retry when the
input order is nondeterministic; a pure function of the row cannot).

Apply it ONLY where the fused per-row work dominates the cost of one
narrow-row shuffle (measured per call site): a query whose first
exchange already collapses rows in the scan task (map-side partial
aggregation over few groups, selective pushed filters) loses more to
the added shuffle than it gains in parallelism — measured on the
tumbling-window aggregate: 0.25 s -> 0.65 s WITH the floor, which is
why this is a per-call-site opt-in and not a ``catalog.load`` default.
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql import DataFrame, functions as F

from .catalog import table_path

# unique-key columns per table (the hash-repartition key)
_TABLE_KEYS = {
    "lineitem": ("l_orderkey", "l_linenumber"),
    "orders": ("o_orderkey",),
    "events": ("event_id",),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}

# path -> row-group count (footer metadata is immutable testdata)
_RG_CACHE: dict[str, int] = {}


def _row_groups(path: str) -> int:
    """Total row groups across the file(s) at ``path`` (parquet footer
    read only — no data pages touched)."""
    if path in _RG_CACHE:
        return _RG_CACHE[path]
    import pyarrow.parquet as pq

    files = [path] if os.path.isfile(path) else sorted(
        _glob.glob(os.path.join(path, "*.parquet"))
    )
    total = 0
    for f in files:
        try:
            total += pq.ParquetFile(f).metadata.num_row_groups
        except Exception:
            # non-local / unreadable footer: assume healthy layout
            # (the floor is a local-input remediation, never required
            # for correctness)
            total += 10**9
    _RG_CACHE[path] = total
    return total


def scan_floor(spark, sf_dir: str, name: str, df: DataFrame) -> DataFrame:
    """Return ``df`` hash-repartitioned to the session's default
    parallelism iff the table's parquet layout cannot reach half of it
    with row-group-aligned splits. No-op on healthy layouts."""
    par = spark.sparkContext.defaultParallelism
    if _row_groups(table_path(sf_dir, name)) * 2 >= par:
        return df
    keys = _TABLE_KEYS[name]
    return df.repartition(par, F.xxhash64(*keys))


def dedup_floor(spark, sf_dir: str, name: str, df: DataFrame, cols) -> DataFrame:
    """``scan_floor`` variant for scans whose first exchange is a
    distinct/groupBy on ``cols``: hash-repartition on those PLAIN
    columns (not a synthetic xxhash64 key) so the downstream
    aggregation's ClusteredDistribution is satisfied by THIS exchange
    and no second one is added — the exchange count is unchanged; what
    moves is the partial aggregation, from inside the one-row-group
    single-core scan stage to the post-exchange parallel stage.

    Trade-off vs the un-floored shape: the exchange carries pre-dedup
    rows (map-side partial dedup no longer collapses duplicates before
    the shuffle), which is why this, too, is gated on the parquet
    footer proving the scan cannot parallelize — on a healthy layout
    the partial agg is already parallel and collapsing first is
    strictly better, so the gate returns df untouched.
    """
    par = spark.sparkContext.defaultParallelism
    if _row_groups(table_path(sf_dir, name)) * 2 >= par:
        return df
    return df.repartition(par, *[F.col(c) for c in cols])
