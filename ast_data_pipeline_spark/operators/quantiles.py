"""Exact order statistics at scale — distributed rank selection.

``approx_percentile`` is the built-in answer, but its sketch values
are engine- and merge-order-specific (not oracle-checkable, and two
runs can disagree at the quantile boundary). Exact quantiles are
usually avoided because a per-group rank window serializes each group
through one reducer. This operator gets EXACT quantiles with bounded
work instead:

  1. bucket the fact on a monotone transform of the value (the bucket
     id is then a PREFIX of the (value, tiebreak) ordering, so bucket
     order + within-bucket order == global order)
  2. per-(group, bucket) counts -> tiny table; cumulative offsets per
     group
  3. each target rank r_p = ((n - 1) * p_num) div p_den + 1 (the
     "lower quantile" element — a single deterministic row, integer
     arithmetic only) lands in exactly one bucket
  4. filter the fact to the selected (group, bucket) pairs via a
     broadcast join, rank WITHIN those buckets only, add the offset

Only the selected buckets' rows are ever sorted; everything else is
hash-aggregate traffic. a_mode_median inlines the same machinery for
the 2-element median; this generalizes it to arbitrary probability
lists (production sizes the bucket transform from column stats).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def exact_group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    key_col: str,
    probs: list[tuple[str, int, int]],
    bucket: Column,
) -> DataFrame:
    """One row per group: ``(group_col, <label> for each prob)``.

    ``probs``: (label, numerator, denominator) triples, e.g.
    ("p25", 1, 4). ``bucket`` must be monotone non-decreasing in
    ``value_col``.
    """
    fact = df.select(group_col, value_col, key_col).withColumn("qbkt", bucket)
    bcnt = fact.groupBy(group_col, "qbkt").agg(F.count(F.lit(1)).alias("bn"))
    w_off = (
        Window.partitionBy(group_col)
        .orderBy("qbkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = bcnt.select(
        group_col,
        "qbkt",
        "bn",
        F.coalesce(F.sum("bn").over(w_off), F.lit(0)).alias("boffset"),
        F.sum("bn").over(Window.partitionBy(group_col)).alias("n"),
    )
    # (group, target-rank) rows: one per requested probability
    targets = off.select(group_col, "n").distinct()
    tgt = None
    for label, num, den in probs:
        t = targets.select(
            group_col,
            F.lit(label).alias("q_label"),
            (F.expr(f"((n - 1) * {num}) div {den}") + 1).alias("r"),
        )
        tgt = t if tgt is None else tgt.unionByName(t)
    # which bucket holds each target rank
    sel = (
        off.join(tgt, group_col)
        .filter(
            (F.col("boffset") < F.col("r"))
            & (F.col("r") <= F.col("boffset") + F.col("bn"))
        )
        .select(group_col, "qbkt", "boffset", "q_label", "r")
    )
    w_loc = Window.partitionBy(group_col, "qbkt").orderBy(value_col, key_col)
    # a bucket may hold several targets: rank once per (group, bucket),
    # then match each row's global rank against that bucket's targets
    picked = (
        fact.join(
            F.broadcast(sel.select(group_col, "qbkt").distinct()),
            [group_col, "qbkt"],
        )
        .withColumn("rn_loc", F.row_number().over(w_loc))
        .join(F.broadcast(sel), [group_col, "qbkt"])
        .filter(F.col("rn_loc") + F.col("boffset") == F.col("r"))
    )
    agg = [
        F.max(F.when(F.col("q_label") == label, F.col(value_col))).alias(label)
        for label, _n, _d in probs
    ]
    return picked.groupBy(group_col).agg(*agg)
