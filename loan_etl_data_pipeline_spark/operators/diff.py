"""Keyed table diff — the change-data-capture primitive.

Given two snapshots of a keyed table, emit what changed: rows added,
removed, or modified (with the list of modified columns). This is the
operator behind snapshot-based CDC, regression-testing a pipeline
rewrite against its old output, and auditing an upsert stream
(plans/upsert.py / streaming_upsert) against its source of truth.

One full-outer shuffle join on the key — at 100 TB both sides partial-
shuffle on the same key (or zero-shuffle if both snapshots were written
bucketed on it, sources/bucketed.py), and comparisons are null-safe
codegen expressions. Unchanged rows are dropped before anything else
touches them, so the output is delta-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str] | str,
    *,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """(keys..., change_type, changed_cols) for rows that differ.

    ``change_type`` ∈ {'added', 'removed', 'changed'}; ``changed_cols``
    is a comma-joined sorted column list ('' for added/removed).
    Comparison is null-safe (NULL == NULL is a match, NULL vs value is
    a change). ``compare_cols`` defaults to all shared non-key columns.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if compare_cols is None:
        compare_cols = sorted(
            (set(old.columns) & set(new.columns)) - set(keys)
        )
    o = old.select(
        *[F.col(k).alias(f"__ko_{k}") for k in keys],
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__kn_{k}") for k in keys],
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
        F.lit(True).alias("__in_new"),
    )
    cond = None
    for k in keys:
        eq = F.col(f"__ko_{k}").eqNullSafe(F.col(f"__kn_{k}"))
        cond = eq if cond is None else (cond & eq)
    j = o.join(n, cond, "full_outer")

    diffs = [
        F.when(
            ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")), F.lit(c)
        )
        for c in compare_cols
    ]
    changed_cols = F.concat_ws(",", *diffs) if diffs else F.lit("")
    change_type = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(changed_cols != "", F.lit("changed"))
    )
    return (
        j.withColumn("change_type", change_type)
        .filter(F.col("change_type").isNotNull())
        .select(
            *[
                F.coalesce(F.col(f"__kn_{k}"), F.col(f"__ko_{k}")).alias(k)
                for k in keys
            ],
            "change_type",
            F.when(F.col("change_type") == "changed", changed_cols)
            .otherwise(F.lit(""))
            .alias("changed_cols"),
        )
    )
