"""Skew mitigation: salted joins for heavy-hitter keys.

The engine's first line of defense is AQE (session.py turns on
``spark.sql.adaptive.skewJoin``), which splits oversized sort-merge
partitions at runtime. But AQE can only split what it can see: it works
on map-output sizes of a *shuffle* join, after the skewed partition was
already written, and it cannot help when the planner picked a
shuffled-hash join without runtime stats, when one key is hot enough
that even a split partition re-skews downstream, or in aggregations
over exploded intermediates. Salting removes the hotspot *before* the
shuffle: the big side scatters each key across ``salt`` sub-keys, the
small side replicates ``salt``× , and the join key becomes
(key, salt) — perfectly sharding a hot key at the cost of inflating the
small side by the salt factor.

Rule of thumb at 100 TB: broadcast if the small side fits (no shuffle
at all) > AQE skew-split (free, automatic) > salted join (this module,
when a key is pathological) — in that order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    *,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``big`` ⋈ ``small`` on ``on`` with the hot keys sharded.

    The salt mixes a whole-row hash with a per-row ordinal
    (``monotonically_increasing_id``), so even fully duplicate rows —
    the common ``fact.select(key)`` shape — scatter across shards; a
    row-hash alone would send every identical row to one shard and
    leave the hotspot intact. The ordinal makes a row's salt *value*
    vary across retries/partitionings, but never the *result*: the
    small side carries every salt value, so each big row still meets
    exactly its key matches whatever shard it lands in. The small side
    is replicated ``salt`` times via a literal-array explode (rows ×
    salt, no shuffle to build). Supports the join types where
    replicate-right is sound for row-preservation: inner and left.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left' (got {how!r}); for right/"
            "full joins salt the other side or fall back to AQE skew handling"
        )
    keys = [on] if isinstance(on, str) else list(on)
    salt_expr = F.pmod(
        F.xxhash64(*[F.col(c) for c in big.columns], F.monotonically_increasing_id()),
        F.lit(salt),
    )
    b = big.withColumn("__salt", salt_expr)
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return b.join(s, [*keys, "__salt"], how).drop("__salt")


def skew_report(df: DataFrame, key_col: str) -> DataFrame:
    """Key-distribution diagnostics: decide broadcast vs AQE vs salt
    with numbers instead of folklore.

    Two aggregates — per-key counts (the one real shuffle, partial aggs
    absorb heavy keys map-side) then a scalar summary over the count
    distribution. ``skew_ratio`` (max over mean rows-per-key) is the
    number that picks the strategy: ~1 means uniform (do nothing),
    tens means AQE's split handles it, hundreds+ on a join key means
    salt. Quantiles are exact rank-select over the bigint counts (the
    portable scheme q_quantiles certifies); mean is one exact double
    division.

    Output: one row (n_keys, n_rows, max_cnt, avg_cnt, p50_cnt,
    p99_cnt, skew_ratio). An EMPTY input still yields its one row, with
    n_keys = 0 and null summary fields — branch on n_keys, not on
    skew_ratio (an extra emptiness scan would double the cost of a
    diagnostic that runs on 100 TB inputs).
    """
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("cnt"))
    q = F.expr("percentile(cnt, array(0.5, 0.99))")
    n_rows = F.sum("cnt").cast("bigint")
    n_keys = F.count(F.lit(1)).cast("bigint")
    avg = n_rows.cast("double") / n_keys.cast("double")
    return counts.agg(
        n_keys.alias("n_keys"),
        n_rows.alias("n_rows"),
        F.max("cnt").alias("max_cnt"),
        avg.alias("avg_cnt"),
        q[0].alias("p50_cnt"),
        q[1].alias("p99_cnt"),
        (F.max("cnt").cast("double") / avg).alias("skew_ratio"),
    )
