"""Temporal join operators: as-of join and interval (range) join.

The reference has no temporal-join operator (its pipelines are
file-batch oriented), but any event/work-queue engine at 100 TB needs
both; they are first-class here alongside the SURVEY §2 surface.

Scale design:

- ``asof_join``  — the classic *union + window* formulation. A naive
  as-of is an inequality join (O(L×R) candidate space, no hash path).
  Instead we union left and right rows into one stream, shuffle ONCE on
  the join keys, sort within each key-partition by timestamp, and carry
  the most recent right-side payload forward with
  ``last(..., ignorenulls=True)``.  Cost = one shuffle of L+R rows, no
  pair explosion, AQE-friendly.  This is the standard scalable as-of on
  Spark (same shape Flink's temporal join and kdb's aj compile to).

- ``range_join_binned`` — Spark has no range-join optimizer, so a
  point-in-interval join would fall back to BroadcastNestedLoopJoin
  (fine for tiny interval tables, quadratic for big ones).  The scale
  path bins both sides: each point computes its bucket (one value),
  each interval explodes into the buckets it covers; an equi-join on
  bucket + an exact residual predicate gives the answer with a plain
  hash shuffle.  Disjoint buckets mean each (point, interval) match
  appears exactly once — no dedup pass needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    payload_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: for every left row, attach ``payload_cols``
    from the most recent right row with the same ``on`` keys and
    ``right.ts <= left.ts`` (ties at equal ts match, i.e. ``>=``).

    Right-side ties on (keys, ts) must be pre-deduplicated by the
    caller for deterministic output; the driver testdata has unique
    (user_id, ts) so this holds trivially.

    Returns all left columns plus ``<payload><suffix>`` columns
    (NULL where no right row precedes the left row).
    """
    left_payload_t = left.select("*").schema
    right_payload = right.select(*payload_cols).schema

    l2 = left.select(
        *[F.col(c) for c in on],
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(f.name) for f in left_payload_t]).alias("__lp"),
        F.lit(None).cast(right_payload).alias("__rp"),
    )
    r2 = right.select(
        *[F.col(c) for c in on],
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(left_payload_t).alias("__lp"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("__rp"),
    )
    # right rows sort before left rows at equal ts => ">=" semantics
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l2.unionByName(r2).withColumn(
        "__match", F.last("__rp", ignorenulls=True).over(w)
    )
    out_left = [F.col(f"__lp.{f.name}").alias(f.name) for f in left_payload_t]
    out_right = [
        F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in payload_cols
    ]
    return merged.filter(F.col("__is_left") == 1).select(*out_left, *out_right)


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket: str = "1 hour",
) -> DataFrame:
    """Point-in-interval join (``start <= ts < end``) via bucket binning.

    ``bucket`` is a Spark interval literal unit understood by
    ``date_trunc`` — currently '1 hour' or '1 day'. Choose it close to
    the median interval length: too fine explodes the interval side,
    too coarse inflates the residual-filter fan-in.
    """
    unit = {"1 hour": "hour", "1 day": "day"}[bucket]
    p = points.withColumn("__bucket", F.date_trunc(unit, F.col(ts_col)))
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.date_trunc(unit, F.col(start_col)),
                # end is exclusive, but an interval ending exactly on a
                # bucket boundary still owns no rows there; sequence is
                # inclusive so the residual filter drops the excess.
                F.date_trunc(unit, F.col(end_col)),
                F.expr(f"interval {bucket}"),
            )
        ),
    )
    return p.join(iv, "__bucket").where(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    ).drop("__bucket")


def asof_join_cogrouped(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    payload_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """As-of join via ``cogroup().applyInPandas`` + ``pandas.merge_asof``
    — the co-grouped-map formulation of :func:`asof_join`.

    Same semantics (backward, inclusive).  This is the Python-boundary
    alternative: one shuffle of each side on the keys, then an Arrow
    round-trip per key-group batch.  The union+window plan stays
    JVM-side and is the production path; this form exists for
    cross-validation and as the template for as-of logic that needs
    real pandas (e.g. tolerance windows with irregular calendars).
    """
    import pandas as pd  # local: only the UDF path needs it

    from pyspark.sql.types import StructType

    out_fields = list(left.schema.fields) + [
        type(f)(f"{f.name}{suffix}", f.dataType, True)
        for f in right.select(*payload_cols).schema.fields
    ]
    out_schema = StructType(out_fields)
    left_cols = list(left.columns)

    # when left and right share lineage (e.g. two filters of one table)
    # their ts attributes are the same Catalyst attribute; cogroup
    # dedupes it out of the right-side pandas frame. A rename forces a
    # fresh attribute so both frames keep their timestamp.
    rts = f"__{ts_col}_r"
    right2 = right.select(
        *on, F.col(ts_col).alias(rts), *[F.col(c) for c in payload_cols]
    )

    def merge(lt: pd.DataFrame, rt: pd.DataFrame) -> pd.DataFrame:
        if lt.empty:
            return pd.DataFrame(columns=[f.name for f in out_fields])
        lt = lt.sort_values(ts_col, kind="mergesort")
        if rt.empty:
            for c in payload_cols:
                lt[f"{c}{suffix}"] = None
            return lt
        rt = rt[[rts] + payload_cols].rename(
            columns={c: f"{c}{suffix}" for c in payload_cols}
        ).sort_values(rts, kind="mergesort")
        out = pd.merge_asof(
            lt, rt, left_on=ts_col, right_on=rts, direction="backward"
        )
        return out[left_cols + [f"{c}{suffix}" for c in payload_cols]]

    return (
        left.groupBy(*on)
        .cogroup(right2.groupBy(*on))
        .applyInPandas(merge, out_schema)
    )
