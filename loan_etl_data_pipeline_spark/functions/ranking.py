"""Distributed global ranking without the single-partition window.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY compiles to
Exchange SinglePartition — every row through one task, a verified
non-starter at scale. This module is the classic distributed
construction, factored out of curriculum_tiles (functions/splits.py) so
every consumer of a global total order shares it:

1. range-partition + sort on the order columns (the same shuffle any
   global ranking pays, but parallel);
2. per-partition row counts (one tiny job; numPartitions rows to the
   driver) → cumulative offsets broadcast back as a literal map;
3. global rank = partition offset + local row_number, whose window is
   partitioned by the materialized partition id — no further exchange.

The result is independent of the (sampled, run-varying) range
boundaries PROVIDED the order columns form a TOTAL order — equal sort
keys could land on either side of a boundary and would be ranked
arbitrarily. Callers must include a unique tie-break column; that is
the same determinism contract every top-k/mode query in this engine
carries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F


def global_rank(
    df: DataFrame,
    order_by: list[Column],
    *,
    rank_col: str = "rank",
) -> DataFrame:
    """All input columns plus ``rank_col`` = 1-based dense global rank
    under ``order_by`` (sort-order Columns, e.g. ``F.desc("cnt")``;
    must be a total order — include a unique tie-break).

    The ranged intermediate is persisted (the counts job and the
    caller's action both read it; an unpersisted frame would run the
    whole upstream twice and a nondeterministic upstream could shift
    range boundaries between passes). It is attached to the result's
    ``_persisted_intermediates`` for operators.dedup.
    release_intermediates; bench/driver sessions fall back to
    clearCache between queries.

    Total rows ranked is attached as ``result._global_rank_n`` (the
    driver already knows it from the offsets job — callers doing ntile
    arithmetic need it without a second count job).
    """
    from pyspark import StorageLevel

    nparts = max(df.sparkSession.sparkContext.defaultParallelism, 1)
    ranged = (
        df.repartitionByRange(nparts, *order_by)
        .sortWithinPartitions(*order_by)
        .withColumn("__pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    pid_counts = {
        r["__pid"]: r["cnt"]
        for r in ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    n = sum(pid_counts.values())
    if n == 0:
        ranged.unpersist()
        out = df.withColumn(rank_col, F.lit(None).cast("bigint"))
        out._global_rank_n = 0
        return out
    offsets, acc = {}, 0
    for pid in sorted(pid_counts):
        offsets[pid] = acc
        acc += pid_counts[pid]
    off_expr = F.element_at(
        F.create_map(*[F.lit(x) for kv in sorted(offsets.items()) for x in kv]),
        F.col("__pid"),
    )
    w = Window.partitionBy("__pid").orderBy(*order_by)
    out = ranged.withColumn(
        rank_col, (off_expr + F.row_number().over(w)).cast("bigint")
    ).drop("__pid")
    out._persisted_intermediates = [ranged]
    out._global_rank_n = n
    return out


def global_cumsum(
    df: DataFrame,
    order_by: list[Column],
    value_col: str,
    *,
    cum_col: str = "cum",
) -> DataFrame:
    """All input columns plus ``cum_col`` = inclusive global prefix sum
    of ``value_col`` under ``order_by`` — the SUM generalization of
    :func:`global_rank`, with the same construction: range-partition on
    the order, per-partition local cumsum, per-partition TOTALS (one
    small collect) turned into additive offsets. A naive
    ``Window.orderBy(...)`` with no partition key would funnel every
    row through ONE task; this stays fully parallel. ``value_col``
    must be integral (exact prefix sums — float prefixes re-associate).
    Same release contract as global_rank (``_persisted_intermediates``).
    """
    from pyspark import StorageLevel

    vtype = dict(df.dtypes).get(value_col)
    if vtype not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"value column {value_col!r} must be integral, got {vtype!r}"
        )
    nparts = max(df.sparkSession.sparkContext.defaultParallelism, 1)
    ranged = (
        df.repartitionByRange(nparts, *order_by)
        .sortWithinPartitions(*order_by)
        .withColumn("__pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    stats = ranged.groupBy("__pid").agg(
        F.sum(value_col).cast("bigint").alias("s"),
        F.sum(F.when(F.col(value_col).isNull(), 1).otherwise(0)).alias("nulls"),
    ).collect()
    n_null = sum(r["nulls"] for r in stats)
    if n_null:
        # NULLs would silently vanish from the prefix (window SUM skips
        # them), breaking the exact-layout contract — reject up front
        ranged.unpersist()
        raise ValueError(
            f"value column {value_col!r} has {n_null} NULLs: coalesce or "
            "filter them before the cumsum"
        )
    pid_sums = {r["__pid"]: r["s"] for r in stats}
    if not pid_sums:
        ranged.unpersist()
        out = df.withColumn(cum_col, F.lit(None).cast("bigint"))
        out._persisted_intermediates = []
        return out
    offsets, acc = {}, 0
    for pid in sorted(pid_sums):
        offsets[pid] = acc
        acc += pid_sums[pid]
    off_expr = F.element_at(
        F.create_map(*[F.lit(x) for kv in sorted(offsets.items()) for x in kv]),
        F.col("__pid"),
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = ranged.withColumn(
        cum_col, (off_expr + F.sum(value_col).over(w)).cast("bigint")
    ).drop("__pid")
    out._persisted_intermediates = [ranged]
    return out


def global_cumsum_multi(
    df: DataFrame,
    order_by: list[Column],
    value_cols: list[str],
    *,
    suffix: str = "_cum",
) -> DataFrame:
    """Inclusive global prefix sums of SEVERAL integral columns under
    one ``order_by`` — each ``c`` in ``value_cols`` gains ``c+suffix``.

    The k-column generalization of :func:`global_cumsum` paying ONE
    range shuffle instead of k: consumers like the Jonckheere–Terpstra
    trend statistic need per-group running totals over the same value
    axis, and k separate cumsum calls would range-partition (and
    persist) the frame k times. Same construction: range-partition +
    local window sums, per-partition totals (ONE tiny collect for all k
    columns) turned into additive offsets. Same contracts: columns must
    be integral and NULL-free (exactness), ``order_by`` must be a total
    order, intermediate persisted and attached as
    ``_persisted_intermediates`` for release_intermediates.
    """
    from pyspark import StorageLevel

    if not value_cols:
        raise ValueError("value_cols must be non-empty")
    dtypes = dict(df.dtypes)
    for c in value_cols:
        if dtypes.get(c) not in ("tinyint", "smallint", "int", "bigint"):
            raise ValueError(
                f"value column {c!r} must be integral, got {dtypes.get(c)!r}"
            )
    nparts = max(df.sparkSession.sparkContext.defaultParallelism, 1)
    ranged = (
        df.repartitionByRange(nparts, *order_by)
        .sortWithinPartitions(*order_by)
        .withColumn("__pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    aggs = []
    for c in value_cols:
        aggs.append(F.sum(c).cast("bigint").alias(f"s_{c}"))
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"n_{c}")
        )
    stats = ranged.groupBy("__pid").agg(*aggs).collect()
    for c in value_cols:
        n_null = sum(r[f"n_{c}"] for r in stats)
        if n_null:
            ranged.unpersist()
            raise ValueError(
                f"value column {c!r} has {n_null} NULLs: coalesce or "
                "filter them before the cumsum"
            )
    if not stats:
        ranged.unpersist()
        out = df
        for c in value_cols:
            out = out.withColumn(c + suffix, F.lit(None).cast("bigint"))
        out._persisted_intermediates = []
        return out
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = ranged
    for c in value_cols:
        pid_sums = {r["__pid"]: (r[f"s_{c}"] or 0) for r in stats}
        offsets, acc = {}, 0
        for pid in sorted(pid_sums):
            offsets[pid] = acc
            acc += pid_sums[pid]
        off_expr = F.element_at(
            F.create_map(*[F.lit(x) for kv in sorted(offsets.items()) for x in kv]),
            F.col("__pid"),
        )
        out = out.withColumn(
            c + suffix, (off_expr + F.sum(c).over(w)).cast("bigint")
        )
    out = out.drop("__pid")
    out._persisted_intermediates = [ranged]
    return out


def ntile_from_rank(rank: Column, n: int, n_tiles: int) -> Column:
    """Exact ``ntile(n_tiles)`` assignment from a 1-based global rank
    over ``n`` rows — pure arithmetic, no window: the first ``n %
    n_tiles`` tiles get ``n // n_tiles + 1`` rows, the rest ``n //
    n_tiles`` (ANSI ntile semantics, verified against both engines).
    """
    if n_tiles <= 0:
        raise ValueError(f"n_tiles must be positive, got {n_tiles}")
    base, rem = n // n_tiles, n % n_tiles
    if base == 0:  # fewer rows than tiles: tile == rank
        return rank.cast("bigint")
    cut = rem * (base + 1)
    return (
        F.when(rank <= F.lit(cut), F.ceil(rank / F.lit(base + 1)))
        .otherwise(F.lit(rem) + F.ceil((rank - F.lit(cut)) / F.lit(base)))
        .cast("bigint")
    )


def quantile_normalize(
    df: DataFrame,
    value_col: str,
    by: str,
    id_col: str,
    *,
    out_col: str = "norm",
) -> DataFrame:
    """Cross-source quantile normalization (the Bolstad batch-effect
    correction, generalized to unequal group sizes): every row's value
    is replaced by the POOLED distribution's value at the same
    within-group quantile, so all groups end up with identical value
    distributions — the standard fix when one source's quality/length
    scale is shifted relative to the corpus and per-source percentiles
    (q_quality_percentiles) aren't enough because downstream wants
    VALUES, not ranks.

    Exact integer rule: a row at within-group rank r of n maps to the
    pooled order statistic at index

        j = ceil((2r−1)·N / (2n))   (midpoint quantile, clamped ≥ 1)

    — pure int64 arithmetic, so the mapping (and therefore the whole
    operator) is value-oracle-able. Ties break by ``id_col`` in both
    rankings, making every step a strict total order.

    Scale shape: TWO distributed global_rank passes (range shuffles —
    never a per-group window that funnels a giant group through one
    task; within-group ranks come from the (by, value, id) global rank
    minus broadcast per-group offsets, the q_quality_percentiles
    decomposition) + ONE equality join on the pooled index.

    Returns (id_col, by, value_col, out_col).
    """
    src_ranked = global_rank(
        df.select(
            F.col(id_col).alias("__id"),
            F.col(by).alias("__by"),
            F.col(value_col).alias("__v"),
        ),
        [F.asc("__by"), F.asc("__v"), F.asc("__id")],
        rank_col="__gr",
    )
    grp = src_ranked.groupBy("__by").agg(
        F.min("__gr").alias("__off"), F.count(F.lit(1)).alias("__n")
    )
    pooled = global_rank(
        df.select(F.col(value_col).alias("__pv"), F.col(id_col).alias("__pid2")),
        [F.asc("__pv"), F.asc("__pid2")],
        rank_col="__j",
    )
    n_total = pooled._global_rank_n
    rows = (
        src_ranked.join(F.broadcast(grp), "__by")
        .withColumn("__r", F.col("__gr") - F.col("__off") + 1)
        .withColumn(
            "__j",
            F.expr(
                f"greatest(((2 * __r - 1) * {n_total}L + 2 * __n - 1)"
                " div (2 * __n), 1L)"
            ),
        )
    )
    out = rows.join(pooled.select("__j", "__pv"), "__j").select(
        F.col("__id").alias(id_col),
        F.col("__by").alias(by),
        F.col("__v").alias(value_col),
        F.col("__pv").alias(out_col),
    )
    out._persisted_intermediates = [
        *getattr(src_ranked, "_persisted_intermediates", ()),
        *getattr(pooled, "_persisted_intermediates", ()),
    ]
    return out
