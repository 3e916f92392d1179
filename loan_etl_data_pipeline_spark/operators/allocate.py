"""Exact integer allocation: largest-remainder proration per group.

Distributing an integer budget across a group's members proportionally
to an integer weight — points across an order's line items, a token
budget across a source's documents, sampled rows across strata — has
the classic rounding trap: naive per-member rounding doesn't sum back
to the budget. The largest-remainder (Hamilton) method fixes it with
pure integer arithmetic, which also makes every value exactly
replayable as SQL window functions (full value-hash oracle, no float
drift):

    floor_share_i = floor(budget * w_i / W)        (W = sum of weights)
    leftover      = budget - sum(floor_share_i)    (< group size)
    alloc_i       = floor_share_i + 1 for the `leftover` members with
                    the largest remainder budget*w_i mod W
                    (deterministic tie-break on a caller column)

Scale: everything is windows partitioned by the group key — one shuffle
on the group key, group cardinality is the per-partition working set
(line items per order, docs per source bucket), never the global row
count. No driver-side state.

Reference scope note: the reference engine (pyspark_etl.py) has no
allocation support; EXT-mandate surface for budgeted sampling and
financial proration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F


def largest_remainder(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    *,
    budget: int,
    order_col: str,
    alloc_col: str = "alloc",
) -> DataFrame:
    """All input columns plus ``alloc_col``: an exact integer split of
    ``budget`` across each ``group_col`` group, proportional to the
    integer-valued ``weight_col``, summing to exactly ``budget`` per
    group. Ties in remainder break on larger weight first (a bigger
    stake earns the marginal unit), then ascending ``order_col``
    (which must be unique within a group for a total order).

    Weights must be non-negative integers (cast internally to bigint;
    integral doubles like TPC-H quantities are exact). A group whose
    weights sum to zero gets the budget by ``order_col`` rotation:
    floor(budget/n) each plus one extra for the first budget-mod-n
    members.
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    wg = Window.partitionBy(group_col)
    w = F.col(weight_col).cast("bigint")
    out = (
        df.withColumn("__w", w)
        .withColumn("__tot", F.sum("__w").over(wg))
        .withColumn("__n", F.count(F.lit(1)).over(wg))
    )
    # div() is true integer division; `/` on bigints would be double
    # division and break the exact-integer contract
    out = out.withColumn(
        "__floor",
        F.when(
            F.col("__tot") > 0,
            F.expr(f"div({budget} * __w, __tot)"),
        ).otherwise(F.expr(f"div({budget}, __n)")),
    ).withColumn(
        "__rem",
        F.when(
            F.col("__tot") > 0,
            F.lit(budget) * F.col("__w") % F.col("__tot"),
        ).otherwise(F.lit(0)),
    )
    wo = Window.partitionBy(group_col).orderBy(
        F.desc("__rem"), F.desc("__w"), F.asc(order_col)
    )
    out = (
        out.withColumn("__leftover", F.lit(budget) - F.sum("__floor").over(wg))
        .withColumn("__rk", F.row_number().over(wo))
        .withColumn(
            alloc_col,
            (
                F.col("__floor")
                + F.when(F.col("__rk") <= F.col("__leftover"), F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).cast("bigint"),
        )
    )
    return out.drop("__w", "__tot", "__n", "__floor", "__rem", "__leftover", "__rk")
