"""Aggregation operators (SURVEY.md §2.5).

- ``pricing_summary``      — A8-style multi-aggregate scan (TPC-H Q1 shape).
- ``crosstab_with_margins`` — A3: the reference's ``pd.crosstab(margins=True)``
  (ref: distribution_by_county_state.py:32-48) as groupBy().pivot() + margin
  column + margin row; optional grand-total normalization.

Scale notes: both are single-shuffle partial aggregations (map-side
combine); the pivot values are declared explicitly so Catalyst skips the
extra distinct-values job and the pivot stays one pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.exact import davg, dsum


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1-shaped pricing summary.

    Aggregates go through exact decimal (functions/exact.py) so the
    result doubles are bit-identical to the DuckDB oracle regardless of
    summation order.
    """
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def crosstab_with_margins(
    df: DataFrame,
    row_key: str,
    col_key: str,
    col_values: list[str],
    normalize: bool = False,
    total_label: str = "Total",
) -> DataFrame:
    """``pd.crosstab(df[row_key], df[col_key], margins=True)`` in Spark.

    One shuffle for the pivot; the margin row is a cheap second
    aggregate over the (tiny) pivoted result unioned back, mirroring
    pandas' ``All`` row/column. ``normalize`` divides every cell by the
    grand total (ref: distribution_by_county_state.py:38,44 uses
    ``normalize=True``). Output sorted by Total desc then row key, with
    the margin row last (as in the reference CSVs).
    """
    # rollup produces the per-key rows AND the grand-total row in ONE
    # aggregation pass (no margin-union that would re-execute the whole
    # upstream plan); the NULL rollup key becomes the margin label.
    # Pivot is spelled as conditional aggregation (rollup().pivot() is
    # unsupported), which also yields the Total column for free.
    cells = [
        F.sum(F.when(F.col(col_key) == v, 1).otherwise(0)).alias(v) for v in col_values
    ]
    out = (
        df.rollup(row_key)
        .agg(*cells, F.count(F.lit(1)).alias(total_label))
        .withColumn(row_key, F.coalesce(F.col(row_key), F.lit(total_label)))
    )

    if normalize:
        # grand total = value of the margin row's Total column
        grand = F.max(
            F.when(F.col(row_key) == total_label, F.col(total_label))
        ).over(Window.partitionBy())
        # integer/integer division of identical operands -> identical
        # doubles in every engine; no rounding needed or wanted.
        for v in [*col_values, total_label]:
            out = out.withColumn(v, F.col(f"`{v}`") / grand)

    return out.orderBy(
        F.col(row_key) == total_label,  # margin row last
        F.col(total_label).desc(),
        F.col(row_key),
    )
