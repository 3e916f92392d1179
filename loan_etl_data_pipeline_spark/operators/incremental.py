"""Incremental aggregate maintenance: fold delta batches into a running
grouped aggregate instead of rescanning history.

The materialized-view discipline every 100 TB pipeline ends up needing:
a daily fact delta is orders of magnitude smaller than the accumulated
table, so the per-key totals should be maintained as

    agg(T ∪ Δ) = merge(agg(T), agg(Δ))

which only works for MERGEABLE statistics. Supported here: ``count``,
``sum`` (exact int64 — pair with the engine's floored-cents contract for
doubles, functions/deterministic.py), ``min``, ``max``. Averages come
out at read time as sum/count; non-mergeable stats (exact medians) need
sketches instead (functions/sketches.py HLL for distinct counts, GK for
quantiles — same update-then-merge shape).

Because every measure is an exact integer (or min/max, which are
order-insensitive), the fold is associative: folding batches in ANY
order, or one shot over the union, produces identical rows — asserted
by test and by the q_incremental_agg oracle (the incremental fold must
match DuckDB's plain GROUP BY over the full table).

No counterpart in the reference (its 71-line pipeline rescans fully,
airflow/dags/etl/pyspark_etl.py); this is the EXT scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

_KINDS = ("count", "sum", "min", "max")


def aggregate_batch(
    df: DataFrame, keys: list[str], measures: dict[str, tuple[str, str | None]]
) -> DataFrame:
    """One batch's partial aggregate: ``measures`` maps output alias →
    (kind, source column); kind ``count`` ignores the column. Source
    columns must already be exact (integers / cents) — this operator
    adds no rounding of its own."""
    aggs = []
    for alias, (kind, col) in measures.items():
        if kind == "count":
            aggs.append(F.count(F.lit(1)).cast("bigint").alias(alias))
        elif kind == "sum":
            aggs.append(F.sum(col).cast("bigint").alias(alias))
        elif kind == "min":
            aggs.append(F.min(col).cast("bigint").alias(alias))
        elif kind == "max":
            aggs.append(F.max(col).cast("bigint").alias(alias))
        else:
            raise ValueError(f"unsupported measure kind {kind!r}; use {_KINDS}")
    return df.groupBy(*keys).agg(*aggs)


def merge_aggregates(
    prev: DataFrame | None,
    delta_agg: DataFrame,
    keys: list[str],
    measures: dict[str, tuple[str, str | None]],
) -> DataFrame:
    """Fold one batch aggregate into the running aggregate.

    Full-outer join on the grouping keys (a key may exist in only one
    side), then the per-kind merge rule: add for count/sum,
    least/greatest for min/max — all null-safe so fresh keys pass
    through unchanged. The join cost is aggregate-sized (distinct keys),
    never fact-sized; with both sides bucketed by the keys
    (sources/bucketed.py) it is exchange-free.
    """
    if prev is None:
        return delta_agg
    p, d = prev.alias("p"), delta_agg.alias("d")
    joined = p.join(d, on=keys, how="full_outer")
    cols = [F.col(k) for k in keys]
    for alias, (kind, _) in measures.items():
        a, b = F.col(f"p.{alias}"), F.col(f"d.{alias}")
        if kind in ("count", "sum"):
            merged = F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0))
        elif kind == "min":
            merged = F.least(F.coalesce(a, b), F.coalesce(b, a))
        else:  # max
            merged = F.greatest(F.coalesce(a, b), F.coalesce(b, a))
        cols.append(merged.cast("bigint").alias(alias))
    return joined.select(*cols)


def fold_batches(
    batches: list[DataFrame],
    keys: list[str],
    measures: dict[str, tuple[str, str | None]],
) -> DataFrame:
    """Convenience: fold a sequence of delta batches left to right."""
    if not batches:
        raise ValueError("fold_batches needs at least one batch")
    acc = None
    for b in batches:
        acc = merge_aggregates(acc, aggregate_batch(b, keys, measures), keys, measures)
    return acc


def join_view_delta(
    a_old: DataFrame,
    da: DataFrame,
    b_old: DataFrame,
    db: DataFrame,
    on: list[str],
) -> DataFrame:
    """The new rows of a materialized join view A ⋈ B when both inputs
    receive APPEND deltas (the standard incremental-view-maintenance
    identity for inner equi-joins):

        Δ(A ⋈ B) = (ΔA ⋈ B) ∪ (A ⋈ ΔB) ∪ (ΔA ⋈ ΔB)

    Every (a, b) result pair lands in exactly ONE term — the one where
    the LATER-arriving side is the delta — so the union needs no dedup
    and the maintained view is multiset-identical to the full rejoin
    (asserted by test and by the q_incremental_join oracle).

    Scale: the whole point is that |Δ| ≪ |old|. ΔA ⋈ B_old probes the
    accumulated table only on the delta's join keys — store the
    accumulated sides bucketed on the join key (sources/bucketed.py)
    and both old-side probes are exchange-free, or partition by an
    equi-correlated column and the key filter prunes the scan. The
    old sides here are DataFrames (in production: versioned snapshot
    reads, sources/versioned.py); nothing rescans the union of all
    history per batch except the delta-keyed probe itself.
    """
    return (
        da.join(b_old, on)
        .unionByName(a_old.join(db, on))
        .unionByName(da.join(db, on))
    )


def fold_join_batches(
    a_batches: list[DataFrame],
    b_batches: list[DataFrame],
    on: list[str],
) -> DataFrame:
    """Maintain the join view over aligned append batches: batch i
    contributes join_view_delta(A_{<i}, ΔA_i, B_{<i}, ΔB_i) and the
    view is the union of the deltas — never a full rejoin. Returns the
    final view (multiset-equal to full_A ⋈ full_B)."""
    if len(a_batches) != len(b_batches) or not a_batches:
        raise ValueError("need equal-length, non-empty batch lists")
    view = None
    a_old = None
    b_old = None
    for da, db in zip(a_batches, b_batches):
        if a_old is None:
            delta = da.join(db, on)
        else:
            delta = join_view_delta(a_old, da, b_old, db, on)
        view = delta if view is None else view.unionByName(delta)
        a_old = da if a_old is None else a_old.unionByName(da)
        b_old = db if b_old is None else b_old.unionByName(db)
    return view
