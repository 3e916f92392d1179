"""Slowly-changing-dimension (type 2) operators.

The reference pipeline lands loan snapshots and overwrites state
(`airflow/dags/etl/pyspark_etl.py:48-64` keeps only the latest clean
table); a warehouse consumer of that data almost always wants the
*history* too. This module is the standard kit:

- :func:`scd2_from_history` — collapse a full change log into version
  rows (valid_from / valid_to / is_current), suppressing consecutive
  no-op changes;
- :func:`scd2_merge` — incrementally apply a new change batch to an
  existing dimension, closing current rows and appending versions.
  Contract: ``merge(build(h1), h2) == build(h1 ∪ h2)`` whenever h2 is
  strictly later than h1 per key (the property test asserts exactly
  this);
- :func:`point_in_time_join` — join facts to the version that was
  active at each fact's timestamp (``valid_from <= t < valid_to``).

Scale notes. ``scd2_from_history`` is ONE shuffle on the dimension
key: both window passes (change suppression, then valid_to/lead) use
the same partitioning and ordering, so Catalyst plans a single
exchange + sort and runs both Window nodes over it. ``scd2_merge``
shuffles only the delta plus the touched keys' current rows — the
dimension's closed history streams through untouched via an anti-join
on the (small, broadcastable) changed-key set. The PIT join is a key
equality join with a residual range predicate: the equality key does
the partitioning, so it scales exactly like any fact-to-dim join and
never degenerates into a cross product.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _as_list(cols: Sequence[str] | str) -> list[str]:
    return [cols] if isinstance(cols, str) else list(cols)


def scd2_from_history(
    df: DataFrame,
    key_cols: Sequence[str] | str,
    attr_cols: Sequence[str] | str,
    order_col: str,
    *,
    tiebreak_cols: Sequence[str] | str = (),
) -> DataFrame:
    """Build type-2 version rows from a full change log.

    Input: one row per observed state (key, attributes, ``order_col``
    ascending event order — a timestamp or a sequence number).
    Consecutive rows of a key with identical attributes (null-safe
    struct compare) are no-op observations and collapse into the
    earlier version. Output columns: keys, attrs, ``valid_from``
    (= order_col of the change), ``valid_to`` (next change's
    order_col, null for the open version), ``version`` (1-based per
    key), ``is_current``.

    ``tiebreak_cols`` makes the within-key order total when
    ``order_col`` can tie (two events in the same microsecond): ties
    are ordered by the tiebreaks, and the *loser* of the tie becomes a
    zero-length version (valid_from == valid_to) rather than a
    nondeterministic survivor.
    """
    keys = _as_list(key_cols)
    attrs = _as_list(attr_cols)
    ties = _as_list(tiebreak_cols)
    order = [F.col(order_col).asc(), *(F.col(t).asc() for t in ties)]
    w = Window.partitionBy(*keys).orderBy(*order)

    cur = F.struct(*[F.col(a) for a in attrs])
    changed = (
        df.withColumn("__prev", F.lag(cur).over(w))
        .filter(F.col("__prev").isNull() | ~cur.eqNullSafe(F.col("__prev")))
        .drop("__prev")
    )
    # same partitioning+ordering as w → no second exchange or sort
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return changed.select(
        *keys,
        *attrs,
        F.col(order_col).alias("valid_from"),
        F.lead(order_col).over(w2).alias("valid_to"),
        F.row_number().over(w2).cast("bigint").alias("version"),
        F.lead(order_col).over(w2).isNull().alias("is_current"),
    )


def scd2_merge(
    dim: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str] | str,
    attr_cols: Sequence[str] | str,
    order_col: str,
    *,
    tiebreak_cols: Sequence[str] | str = (),
) -> DataFrame:
    """Apply a change batch to an existing type-2 dimension.

    ``dim`` is prior :func:`scd2_from_history` / ``scd2_merge`` output;
    ``changes`` carries (keys, attrs, order_col[, tiebreaks]) with
    every row STRICTLY LATER per key than the dimension's current
    ``valid_from`` (the incremental-load precondition; violating it
    would interleave history and is the caller's bug). No-op changes —
    equal to the key's current attributes, or to the in-batch
    predecessor — are suppressed exactly as in the full rebuild, so
    ``merge(build(h1), h2) == build(h1 ∪ h2)``.

    Plan: the delta is window-processed per key seeded with the
    current row's attributes (one shuffle of delta ∪ touched current
    rows); closed history passes through via an anti-join on the
    changed-key set, which AQE turns into a broadcast when the batch
    is small — the usual case for an incremental load.
    """
    keys = _as_list(key_cols)
    attrs = _as_list(attr_cols)
    ties = _as_list(tiebreak_cols)
    order = [F.col(order_col).asc(), *(F.col(t).asc() for t in ties)]
    cur_struct = F.struct(*[F.col(a) for a in attrs])

    current = dim.filter("is_current")
    # seed rows: the current version of each key, marked so we can
    # split it back out after the windows run over (seed ∪ delta)
    seed = current.select(
        *keys,
        *attrs,
        F.col("valid_from").alias(order_col),
        F.lit(True).alias("__seed"),
        F.col("version").alias("__base_version"),
    )
    delta = changes.select(
        *keys,
        *attrs,
        F.col(order_col),
        *[F.col(t) for t in ties],
        F.lit(False).alias("__seed"),
        F.lit(None).cast("bigint").alias("__base_version"),
    )
    # seed rows lack the tiebreak cols → null-filled; harmless, since
    # the strictly-later precondition means a seed never ties a delta
    unioned = seed.unionByName(delta, allowMissingColumns=True)

    w = Window.partitionBy(*keys).orderBy(*order)
    surviving = (
        unioned.withColumn("__prev", F.lag(cur_struct).over(w))
        .filter(
            F.col("__seed")  # the seed row always survives
            | F.col("__prev").isNull()  # brand-new key
            | ~cur_struct.eqNullSafe(F.col("__prev"))
        )
        .drop("__prev")
    )
    w2 = Window.partitionBy(*keys).orderBy(*order)
    base = F.first("__base_version", ignorenulls=True).over(
        Window.partitionBy(*keys)
    )
    versioned = surviving.select(
        *keys,
        *attrs,
        F.col(order_col).alias("valid_from"),
        F.lead(order_col).over(w2).alias("valid_to"),
        (
            F.row_number().over(w2).cast("bigint")
            + F.coalesce(base, F.lit(1)) - F.lit(1)
        ).alias("version"),
        F.lead(order_col).over(w2).isNull().alias("is_current"),
        F.col("__seed"),
    )
    touched = versioned.select(*keys).distinct()
    untouched = dim.join(touched, keys, "left_anti")
    closed_history = dim.filter(~F.col("is_current")).join(touched, keys, "semi")
    return (
        untouched
        .unionByName(closed_history)
        .unionByName(versioned.drop("__seed"))
    )


def point_in_time_join(
    facts: DataFrame,
    dim: DataFrame,
    key_cols: Sequence[str] | str,
    time_col: str,
    *,
    how: str = "left",
) -> DataFrame:
    """Join each fact row to the dimension version active at its time.

    Active means ``valid_from <= t AND (valid_to IS NULL OR
    t < valid_to)`` — the half-open interval convention of
    :func:`scd2_from_history`, so a fact at exactly the change instant
    sees the NEW version. Facts before a key's first version get nulls
    under ``how='left'`` (drop with ``how='inner'``).
    """
    keys = _as_list(key_cols)
    t = F.col(f"__f.{time_col}")
    cond = F.lit(True)
    for k in keys:
        cond = cond & F.col(f"__f.{k}").eqNullSafe(F.col(f"__d.{k}"))
    cond = (
        cond
        & (F.col("__d.valid_from") <= t)
        & (F.col("__d.valid_to").isNull() | (t < F.col("__d.valid_to")))
    )
    f_side = facts.alias("__f")
    d_side = dim.alias("__d")
    dim_cols = [c for c in dim.columns if c not in keys]
    return f_side.join(d_side, cond, how).select(
        *[F.col(f"__f.{c}") for c in facts.columns],
        *[F.col(f"__d.{c}").alias(c) for c in dim_cols],
    )


def bitemporal_snapshot(
    updates: DataFrame,
    key_cols: Sequence[str] | str,
    valid_col: str,
    txn_col: str,
    value_cols: Sequence[str] | str,
    *,
    valid_time,
    txn_bound,
) -> DataFrame:
    """Bitemporal as-of: per key, the value at VALID time ``valid_time``
    as KNOWN at transaction bound ``txn_bound`` — the second time axis
    :func:`point_in_time_join` doesn't have. SCD2's single axis answers
    "what was true at t"; bitemporal answers "what did we BELIEVE was
    true at valid time V, given only updates recorded by T" — the
    audit/backfill question for ledgers with late-arriving retroactive
    corrections.

    Semantics: among rows with ``txn_col <= txn_bound`` and
    ``valid_col <= valid_time``, keep the max ``valid_col``, ties
    broken by max ``txn_col`` (the latest-recorded correction for that
    valid instant wins). Deterministic when (valid, txn) pairs are
    unique per key — txn stamps usually are.

    Plan: one filter + one key-partitioned window (same shuffle shape
    as SCD2 build); ``txn_bound``/``valid_time`` may be Columns (e.g. a
    broadcast scalar) so knowledge time can be data-derived without a
    driver round-trip. Keys with no qualifying update are absent —
    outer-join snapshots at two knowledge times to diff beliefs.
    """
    keys = _as_list(key_cols)
    vals = _as_list(value_cols)
    q = updates.filter(
        (F.col(txn_col) <= txn_bound) & (F.col(valid_col) <= valid_time)
    )
    w = Window.partitionBy(*keys).orderBy(
        F.desc(valid_col), F.desc(txn_col)
    )
    return (
        q.withColumn("__bt_rn", F.row_number().over(w))
        .filter(F.col("__bt_rn") == 1)
        .select(*keys, *vals)
    )
