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
