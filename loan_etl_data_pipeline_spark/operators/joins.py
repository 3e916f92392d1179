"""Ordered joins Spark lacks as built-ins: as-of (nearest-event) join.

Neither the reference (which has no joins at all — SURVEY.md §2 A.3) nor
stock Spark SQL offers an as-of join, yet it is the workhorse of
event/feature alignment in training-data pipelines ("the user's most
recent purchase before this click"). The naive Spark formulation —
equi-join on the key, filter ``r.ts <= l.ts``, then a max-per-left-row
window — materializes every (left, right-history) pair before pruning:
O(|L| x avg-history) shuffle rows, quadratic per key at corpus scale.

This implementation is the single-shuffle union-scan form:

1. tag both sides and union them on (key, ts) — shuffle carries each
   row exactly once;
2. one window per key ordered by (ts, side): a running
   ``last(right-payload, ignorenulls)`` carries the most recent right
   row forward past every left row;
3. keep the left rows; their carried struct IS the as-of match.

Cost is one exchange of |L|+|R| rows and a linear per-partition scan —
the same shape as sessionization (operators/windows.py), so it scales
to skewed keys the same way (a single hot key degrades to a sorted
linear scan, never a pairwise blowup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: float = 0.0,
    upper: float = 0.0,
    suffix: str = "_r",
) -> DataFrame:
    """Interval join: right rows with ``right_ts`` in
    [``left_ts + lower``, ``left_ts + upper``] seconds, per key (inner).

    Stock Spark plans a key-equi-join plus a time filter, which
    materializes every same-key pair before filtering — quadratic per
    key. This is the bucketized form: time is binned at width
    ``upper - lower``, so a left row's window overlaps at most two
    bins; the left side explodes to those bins (×2, no shuffle to
    build), the join key becomes (key, bin) — equality only, one
    shuffle — and the exact BETWEEN filters inside the matched bins.
    Work is proportional to matches per bin neighborhood, not to
    same-key history. Right columns get ``suffix`` (like asof_join).
    """
    if upper <= lower:
        raise ValueError(f"need upper > lower, got [{lower}, {upper}]")
    keys = [on] if isinstance(on, str) else list(on)
    width = float(upper - lower)
    rpay = [c for c in right.columns if c not in keys]

    def _epoch(df: DataFrame, col: str):
        # numeric event-time passes through; timestamp/ntz go through
        # unix_micros (ntz is reinterpreted in the session TZ — pin UTC,
        # as create_session does, for cluster-portable binning)
        if df.schema[col].dataType.simpleString().startswith("timestamp"):
            return F.unix_micros(F.col(col).cast("timestamp")).cast("double") / 1e6
        return F.col(col).cast("double")

    l_epoch = _epoch(left, left_ts)
    lo_bin = F.floor((l_epoch + F.lit(lower)) / F.lit(width)).cast("long")
    hi_bin = F.floor((l_epoch + F.lit(upper)) / F.lit(width)).cast("long")
    # probe lo, lo+1, hi (deduped): in exact arithmetic the window spans
    # at most two bins, but (l+upper)/w can land one ulp past a boundary
    # while (l+lower)/w lands one before — including the middle bin
    # costs nothing after array_distinct and removes that FP miss case
    l_binned = left.withColumn("__le", l_epoch).withColumn(
        "__bin",
        F.explode(F.array_distinct(F.array(lo_bin, lo_bin + F.lit(1), hi_bin))),
    )
    r_binned = right.select(
        *keys,
        F.floor(_epoch(right, right_ts) / F.lit(width)).cast("long").alias("__bin"),
        _epoch(right, right_ts).alias("__re"),
        *[F.col(c).alias(f"{c}{suffix}") for c in rpay],
    )
    return (
        l_binned.join(r_binned, [*keys, "__bin"])
        .filter(
            (F.col("__re") >= F.col("__le") + F.lit(lower))
            & (F.col("__re") <= F.col("__le") + F.lit(upper))
        )
        .drop("__bin", "__le", "__re")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    tolerance: str | float | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: attach the nearest right row per key.

    For each left row, pick the right row with the same ``on`` key and
    the greatest ``right_ts`` <= ``left_ts`` (``direction="backward"``,
    inclusive) or the smallest ``right_ts`` >= ``left_ts``
    (``"forward"``). Unmatched left rows keep nulls in the right
    columns (left-join semantics; left row count is preserved).

    ``tolerance`` voids matches farther than that from the left
    timestamp — an SQL interval string (``"1 hour"``) for timestamp
    columns, a number in the column's unit for numeric event-time.

    Every non-key right column is emitted as ``<name><suffix>``
    (including the right timestamp), so callers never get silent name
    collisions.

    Determinism: if several right rows share (key, ts), the greatest
    payload struct (field-wise comparison) wins — a documented total
    order, unlike pandas ``merge_asof``'s positional pick. Null left
    timestamps match nothing.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    lpay = [c for c in left.columns if c not in keys]
    rpay = [c for c in right.columns if c not in keys]

    r_struct = F.struct(*[F.col(c).alias(c) for c in rpay])
    l_struct = F.struct(*[F.col(c).alias(c) for c in lpay])
    r_type = right.select(r_struct.alias("s")).schema["s"].dataType
    l_type = left.select(l_struct.alias("s")).schema["s"].dataType

    r_side = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        r_struct.alias("__rpay"),
        F.lit(None).cast(l_type).alias("__lpay"),
    )
    l_side = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r_type).alias("__rpay"),
        l_struct.alias("__lpay"),
    )
    unioned = r_side.unionByName(l_side)

    # At equal ts the right row must be visited first so the match is
    # inclusive; asc_nulls_first on the payload makes right-side ties a
    # total order (left rows all have a null __rpay and a distinct
    # __side, so the null never competes).
    ts_order = F.asc("__ts") if direction == "backward" else F.desc("__ts")
    w = Window.partitionBy(*keys).orderBy(
        ts_order, F.asc("__side"), F.asc_nulls_first("__rpay")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    carried = (
        unioned.withColumn("__match", F.last("__rpay", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
        .withColumn(
            "__match",
            F.when(F.col("__ts").isNotNull(), F.col("__match")).otherwise(
                F.lit(None).cast(r_type)
            ),
        )
    )

    if tolerance is not None:
        # timestamp ts columns take an interval string; numeric
        # event-time takes a numeric tolerance (same unit as the column)
        if left.schema[left_ts].dataType.simpleString().startswith("timestamp"):
            bound = F.expr(f"INTERVAL {tolerance}")
        else:
            try:
                bound = F.lit(float(tolerance))
            except (TypeError, ValueError) as exc:
                raise ValueError(
                    f"numeric {left_ts!r} needs a numeric tolerance in the "
                    f"column's unit, got {tolerance!r}"
                ) from exc
        gap = (
            F.col("__ts") - F.col(f"__match.{right_ts}")
            if direction == "backward"
            else F.col(f"__match.{right_ts}") - F.col("__ts")
        )
        gap_ok = gap <= bound
        carried = carried.withColumn(
            "__match", F.when(gap_ok, F.col("__match")).otherwise(F.lit(None).cast(r_type))
        )

    return carried.select(
        *keys,
        *[F.col(f"__lpay.{c}").alias(c) for c in lpay],
        *[F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in rpay],
    )


def fuzzy_blocked_join(
    left: DataFrame,
    right: DataFrame,
    *,
    block_on: str | list[str],
    left_col: str,
    right_col: str,
    max_distance: int = 1,
    suffix: str = "_r",
    pre_filter=None,
    stream_partitions: int | None = None,
) -> DataFrame:
    """Blocked edit-distance (record-linkage) join.

    Matches left/right rows that share a blocking key and whose string
    columns are within ``max_distance`` Levenshtein edits. The blocking
    key is what makes this survive scale: the quadratic pair comparison
    runs only INSIDE a block (one equality shuffle on the block key,
    then a JVM codegen ``levenshtein`` filter per in-block pair) — the
    classic blocking strategy from record-linkage literature, same
    posture as the binned range join above. Spark 3.5+'s three-argument
    ``levenshtein(l, r, threshold)`` form bails out of the DP early once
    the distance exceeds the bound, so the per-pair cost is
    O(len * max_distance), not O(len^2).

    Block keys must be chosen so blocks stay small (soundex/prefix/
    domain keys); a hot block degrades to that block's pairwise cost —
    AQE skew-split spreads it across tasks, and a salt column can be
    appended to ``block_on`` when even one block's pairs overflow a
    task.

    ``pre_filter`` (a Column over post-suffix names) is applied BEFORE
    the distance computation — put cheap pair pruning here (e.g.
    ``col("id_a") < col("id_b_r")`` for a self-join) so it lands ahead
    of the levenshtein in the join condition; Catalyst keeps conjuncts
    in appearance order, so a filter chained after the operator runs
    the DP on pairs the cheap predicate would have discarded.

    ``stream_partitions``: when the right side broadcasts, join
    parallelism equals the STREAM (left) side's partition count — a
    small dirty table read from one parquet file becomes one task doing
    every comparison. Set this to spread a small left side (round-robin
    repartition, cheap at that size); leave None for big inputs whose
    scan parallelism is already right.

    Output: all left columns, right payload columns suffixed, and
    ``distance``.
    """
    blocks = [block_on] if isinstance(block_on, str) else list(block_on)
    rpay = [c for c in right.columns if c not in blocks]
    r = right
    for c in rpay:
        r = r.withColumnRenamed(c, f"{c}{suffix}")
    if stream_partitions is not None:
        left = left.repartition(stream_partitions)
    joined = left.join(r, blocks)
    if pre_filter is not None:
        joined = joined.filter(pre_filter)
    # universally-sound cheap prune: edit distance >= length difference
    # (quoted refs, same as the levenshtein expr below — a bare string
    # through F.col would read a dotted name as a struct path)
    joined = joined.filter(
        F.abs(
            F.length(F.col(f"`{left_col}`"))
            - F.length(F.col(f"`{right_col}{suffix}`"))
        )
        <= max_distance
    )
    # backtick-quote: non-identifier column names ("first name", "a-b")
    # must reach the parser as names, not expressions
    dist = F.expr(
        f"levenshtein(`{left_col}`, `{right_col}{suffix}`, {int(max_distance)})"
    )
    return (
        joined.withColumn("distance", dist)
        .filter((F.col("distance") >= 0) & (F.col("distance") <= max_distance))
    )
