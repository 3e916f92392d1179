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

from pyspark.sql import DataFrame, Window
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


def reconcile_one_to_one(
    a: DataFrame,
    b: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
    *,
    suffixes: tuple[str, str] = ("_a", "_b"),
) -> DataFrame:
    """Deterministic one-to-one matching of two ledgers — settlement
    reconciliation: the i-th entry of A in a match group pairs with the
    i-th entry of B in the same group, leftovers on either side are
    BREAKS. ``key_cols`` defines the match group (include a quantized
    amount bucket for tolerance matching — exact-equality keys are the
    zero-tolerance special case); ``order_cols`` must be a per-group
    total order on each side (occurrence order, e.g. (ts, id)).

    Shape: one row_number window per side on the SAME (keys) partition,
    then ONE full-outer equality join on (keys, rank) — both sides
    shuffle once on the match group, the join is co-partitioned, and no
    group ever cross-products (rank is unique per side per group).
    Returns keys + rank + ``value_col`` under each suffix + ``status``
    in {'matched','only_a','only_b'}; matched rows carry both values so
    callers can aggregate tolerance drift exactly.

    Row presence is carried through the full-outer join as EXPLICIT
    marker columns, never inferred from ``value_col`` nullability: a
    ledger entry whose value is legitimately NULL is still a present
    row (a matched pair with a NULL A-side value is 'matched', not
    'only_b') — ADVICE r4 flagged the nullability-inference version as
    silently corrupting matched/break counts for NULL-bearing ledgers.
    """
    wa = Window.partitionBy(*key_cols).orderBy(*order_cols)
    left = (
        a.select(
            *key_cols,
            *order_cols,
            F.col(value_col).alias(f"{value_col}{suffixes[0]}"),
        )
        .withColumn("rk", F.row_number().over(wa))
        .withColumn("__a_present", F.lit(True))
    )
    right = (
        b.select(
            *key_cols,
            *order_cols,
            F.col(value_col).alias(f"{value_col}{suffixes[1]}"),
        )
        .withColumn("rk", F.row_number().over(wa))
        .withColumn("__b_present", F.lit(True))
    )
    return (
        left.drop(*order_cols)
        .join(right.drop(*order_cols), [*key_cols, "rk"], "full_outer")
        .withColumn(
            "status",
            F.when(
                F.col("__a_present").isNotNull()
                & F.col("__b_present").isNotNull(),
                F.lit("matched"),
            )
            .when(F.col("__a_present").isNotNull(), F.lit("only_a"))
            .otherwise(F.lit("only_b")),
        )
        .drop("__a_present", "__b_present")
    )
