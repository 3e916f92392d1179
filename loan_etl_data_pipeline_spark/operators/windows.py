"""Event-time windowed aggregations + sessionization (EXT E6).

The reference's only "streaming" is a 60 s file-poll sensor
(reference: airflow/dags/drive_watch_dag.py:48-49); real event-time
semantics are part of the mandated extension surface. Batch forms live
here; the Structured Streaming forms (withWatermark + the same window
exprs) are in streaming/.

Both use only built-in expressions so they run JVM-side; sessionization
is the classic gaps-and-islands (lag → flag → running sum → group),
which shuffles once on (user) and is exactly expressible in ANSI SQL for
the oracle. Spark's native ``session_window`` is used in the streaming
variant; the batch SQL form is kept here so batch and oracle agree
term-for-term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    *,
    duration: str = "1 hour",
    group_cols: list[str] | None = None,
    value_col: str = "value",
) -> DataFrame:
    """Tumbling-window count + exact sum per (window, groups).

    Uses ``F.window`` so the same expression lifts directly into
    Structured Streaming with a watermark. Output window_start is a
    second-precision string (see queries.py docstring on nanos).
    """
    group_cols = group_cols or []
    return (
        df.groupBy(F.window(F.col(ts_col), duration).alias("w"), *group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr(
                f"CAST(SUM(CAST(FLOOR(({value_col}) * 100) AS BIGINT)) AS DOUBLE) / 100"
            ).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            *group_cols,
            "n_events",
            "sum_value",
        )
    )


def sessionize(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    *,
    gap: str = "30 minutes",
    id_col: str = "event_id",
) -> DataFrame:
    """Gap-based sessions per user (gaps-and-islands).

    New session when the gap to the previous event exceeds ``gap``.
    One shuffle on user; the two window functions share the same
    partitioning so Catalyst plans a single exchange + sort.

    Output: (user_id, session_start, session_end as strings, n_events,
    session_id ordinal per user).
    """
    w_user = Window.partitionBy(user_col).orderBy(F.asc(ts_col), F.asc(id_col))
    prev_ts = F.lag(F.col(ts_col)).over(w_user)
    flagged = df.withColumn(
        "__new_session",
        F.when(prev_ts.isNull(), 1)
        .when(F.col(ts_col) - prev_ts > F.expr(f"INTERVAL {gap}"), 1)
        .otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_id",
        F.sum("__new_session").over(
            w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("bigint"),
    )
    return (
        sessions.groupBy(user_col, "session_id")
        .agg(
            F.date_format(F.min(ts_col), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max(ts_col), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def resample_timeseries(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    unit: str = "day",
) -> DataFrame:
    """Regularize an irregular per-key series onto a calendar spine.

    The time-series normalization step (feature tables, per-entity
    training sequences): every key gets one row per ``unit`` period
    between its first and last observation; periods with no
    observation carry the previous period's value forward
    (``is_observed`` distinguishes real from filled rows).

    Semantics, all deterministic:
    - collapse to one observation per (key, period): latest ``ts_col``
      wins, value descending breaks exact-timestamp ties (total order);
    - spine = ``sequence(min_period, max_period, interval 1 unit)`` —
      a per-key flatMap off a 2-column aggregate, NOT a cartesian with
      a global calendar table (which would join every key against the
      full corpus span);
    - forward fill = ``last(value, ignorenulls) OVER rows-preceding`` —
      never null, since each key's first period is observed.

    Plan shape: every stage — collapse, bounds, spine join, fill window
    — shuffles on the key (or key+period), so at 100 TB it's ~3
    key-partitioned exchanges of pre-aggregated rows; the spine explode
    multiplies rows only AFTER aggregation, on (key, span) pairs.
    """
    if unit not in ("day", "week", "month"):
        raise ValueError(f"unsupported resample unit: {unit!r}")
    period = F.date_trunc(unit, F.col(ts_col)).cast("date")
    w_collapse = Window.partitionBy(key_col, "period").orderBy(
        F.desc(ts_col), F.desc(value_col)
    )
    obs = (
        df.select(F.col(key_col), period.alias("period"), F.col(ts_col), F.col(value_col))
        .withColumn("__rn", F.row_number().over(w_collapse))
        .filter(F.col("__rn") == 1)
        .select(key_col, "period", F.col(value_col).alias("__v"))
    )
    spine = (
        obs.groupBy(key_col)
        .agg(F.min("period").alias("__lo"), F.max("period").alias("__hi"))
        .select(
            key_col,
            F.explode(
                F.sequence("__lo", "__hi", F.expr(f"interval 1 {unit}"))
            ).alias("period"),
        )
    )
    w_fill = (
        Window.partitionBy(key_col)
        .orderBy("period")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(obs, [key_col, "period"], "left")
        .select(
            key_col,
            "period",
            F.last("__v", ignorenulls=True).over(w_fill).alias(value_col),
            F.col("__v").isNotNull().alias("is_observed"),
        )
    )


def funnel_counts(
    df: DataFrame,
    stages: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel conversion counts: how many users reached each stage.

    A user "reaches" stage i when an event of ``stages[i]`` occurs
    STRICTLY AFTER the timestamp at which they reached stage i-1 (first
    stage: any occurrence). The per-user reach timestamp is the
    earliest such event — the standard ordered-funnel semantics
    (view → click → purchase), robust to events arriving interleaved.

    Plan: ONE shuffle on ``user_col``, then ``len(stages)`` chained
    Window projections over the SAME partitioning (Catalyst reuses the
    single Exchange — verified: one Exchange in the plan), each
    computing ``min(ts WHERE type = stage_i AND ts > prev_reach)``.
    The final count is a tiny global aggregate. No joins, no per-stage
    passes over the fact table; at 100 TB this is the cost of one
    sessionization.

    Output: (stage, stage_idx, users) — users reaching each stage,
    non-increasing down the funnel.
    """
    if not stages:
        raise ValueError("funnel_counts needs at least one stage")
    w = Window.partitionBy(user_col)
    out = df.select(user_col, ts_col, type_col)
    prev = None
    reach_cols = []
    for i, stage in enumerate(stages):
        cond = F.col(type_col) == stage
        if prev is not None:
            cond = cond & (F.col(ts_col) > F.col(prev))
        reach = f"__reach_{i}"
        out = out.withColumn(reach, F.min(F.when(cond, F.col(ts_col))).over(w))
        reach_cols.append(reach)
        prev = reach
    per_user = out.groupBy(user_col).agg(
        *[F.max(rc).alias(rc) for rc in reach_cols]
    )
    counts = per_user.agg(
        *[
            F.sum(F.when(F.col(rc).isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"__n_{i}")
            for i, rc in enumerate(reach_cols)
        ]
    )
    stack_args = ", ".join(
        "'{}', {}, __n_{}".format(s.replace("'", "''"), i, i)
        for i, s in enumerate(stages)
    )
    return counts.select(
        F.expr(
            f"stack({len(stages)}, {stack_args}) as (stage, stage_idx, users)"
        )
    ).select("stage", F.col("stage_idx").cast("bigint").alias("stage_idx"), "users")


def seasonal_decompose(
    series: DataFrame,
    t_col: str,
    val_col: str,
    *,
    period: int = 12,
) -> DataFrame:
    """Classical additive seasonal decomposition by moving averages
    over an integer-valued regular series (one row per integer ``t``,
    exact-int values — cents, counts):

        trend    = the 2×period centered MA (weights 1,2,…,2,1 over
                   ±period/2) — computed EXACTLY as S_{p+1} + S_{p-1},
                   two RANGE-window sums, carried as 2·period × value
        seasonal = per-(t % period) mean of the detrended interior
        residual = the rest

    Every division happens once, on exact int64 numerators and
    denominators, so the whole decomposition value-oracles
    cross-engine. Edge rows (incomplete MA window) get NULL
    trend/resid; seasonal still attaches by phase.

    The unpartitioned windows are intentional: the series is
    CALENDAR-sized (months/days — data-size-free), never a fact
    table; aggregate the facts to the calendar grain first.

    Returns (t_col, val_col, trend, seasonal, resid).
    """
    if period < 2 or period % 2:
        raise ValueError(f"period must be even and >= 2, got {period}")
    h = period // 2
    den = 2 * period
    wp = Window.orderBy("__t").rangeBetween(-h, h)
    wm = Window.orderBy("__t").rangeBetween(-(h - 1), h - 1)
    t = series.select(
        F.col(t_col).alias("__t"),
        F.col(val_col).cast("bigint").alias("__v"),
    ).select(
        "__t",
        "__v",
        (F.sum("__v").over(wp) + F.sum("__v").over(wm)).alias("__t2p"),
        (F.count(F.lit(1)).over(wp) + F.count(F.lit(1)).over(wm)).alias(
            "__nw"
        ),
    ).withColumn(
        "__trend2p",
        F.when(F.col("__nw") == den, F.col("__t2p")).cast("bigint"),
    )
    det = t.withColumn(
        "__det", F.lit(den) * F.col("__v") - F.col("__trend2p")
    ).withColumn("__phase", F.col("__t") % period)
    seas = (
        det.filter(F.col("__det").isNotNull())
        .groupBy("__phase")
        .agg(
            F.sum("__det").cast("bigint").alias("__s_sum"),
            F.count(F.lit(1)).cast("bigint").alias("__s_n"),
        )
    )
    return det.join(seas, "__phase", "left").select(
        F.col("__t").alias(t_col),
        F.col("__v").alias(val_col),
        (F.col("__trend2p").cast("double") / den).alias("trend"),
        (
            F.col("__s_sum").cast("double")
            / (F.lit(den) * F.col("__s_n")).cast("double")
        ).alias("seasonal"),
        (
            (F.col("__det") * F.col("__s_n") - F.col("__s_sum")).cast("double")
            / (F.lit(den) * F.col("__s_n")).cast("double")
        ).alias("resid"),
    )


def theil_sen(series: DataFrame, t_col: str, val_col: str) -> DataFrame:
    """Theil–Sen robust trend: the median of all pairwise slopes
    (value diff / t diff, one IEEE division of exact ints per pair) —
    breakdown point 29%, immune to the outliers that wreck a
    least-squares line. The pair join and the single-partition median
    are series²-sized; the series must be calendar-grained
    (data-size-free), never a fact table. Even-n medians average the
    two positional middles (equal-valued ties make the position choice
    value-neutral). 1 row out: (n_pairs, slope_med).
    """
    m = series.select(
        F.col(t_col).alias("__t"), F.col(val_col).cast("bigint").alias("__v")
    )
    a, b = m.alias("a"), m.alias("b")
    slopes = a.join(b, F.col("a.__t") < F.col("b.__t")).select(
        (
            (F.col("b.__v") - F.col("a.__v")).cast("double")
            / (F.col("b.__t") - F.col("a.__t")).cast("double")
        ).alias("slope")
    )
    w = Window.orderBy("slope")
    ranked = slopes.select(
        "slope", F.row_number().over(w).alias("rn")
    ).crossJoin(F.broadcast(slopes.agg(F.count(F.lit(1)).alias("n"))))
    mid = ranked.filter(F.expr("rn = (n + 1) div 2 OR rn = n div 2 + 1"))
    return mid.groupBy("n").agg(F.avg("slope").alias("slope_med")).select(
        F.col("n").cast("bigint").alias("n_pairs"), "slope_med"
    )


def dtw_distance(
    df: DataFrame,
    key_col: str,
    series_col: str,
    ref_col: str,
    *,
    out_col: str = "dtw_dist",
) -> DataFrame:
    """Dynamic-time-warping distance between two bounded int64 series
    per row (classic Sakoe–Chiba DP, |a_i − b_j| unit cost, full
    window): the shape-alignment metric for calendar series where
    pointwise L1 punishes a one-month phase shift as hard as a real
    divergence.

    Arrow-batched numpy DP — each row is an independent O(n·m) kernel
    over two SHORT arrays (calendar series: 12-60 points), so the work
    is row-local and embarrassingly parallel; nothing shuffles here.
    Integer cost keeps the result exactly replayable by an unrolled
    lateral-alias DP in any SQL engine. For long series (n·m beyond
    ~10⁴) add a Sakoe–Chiba band — not needed for calendar shapes.
    NULL or empty series have no alignment and yield a NULL distance
    (nullable int64 output) instead of failing the job in-kernel.
    """
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    schema = f"{key_col} bigint, {out_col} bigint"

    def _dp(a, b):
        # NULL/empty series — or a NULL ELEMENT inside one (arrow hands
        # those through as None/NaN) — have no alignment: emit NULL,
        # don't crash the whole job inside the kernel
        def clean(s):
            if s is None:
                return None
            vals = list(s)
            if any(
                v is None or (isinstance(v, float) and v != v) for v in vals
            ):
                return None
            return np.asarray(vals, dtype=np.int64)

        a = clean(a)
        b = clean(b)
        if a is None or b is None:
            return None
        n, m = len(a), len(b)
        if n == 0 or m == 0:
            return None
        d = np.empty((n, m), dtype=np.int64)
        for i in range(n):
            for j in range(m):
                c = abs(int(a[i]) - int(b[j]))
                if i == 0 and j == 0:
                    d[i, j] = c
                elif i == 0:
                    d[i, j] = c + d[i, j - 1]
                elif j == 0:
                    d[i, j] = c + d[i - 1, j]
                else:
                    d[i, j] = c + min(
                        d[i - 1, j], d[i, j - 1], d[i - 1, j - 1]
                    )
        return int(d[n - 1, m - 1])

    def _scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = pd.DataFrame(
                {
                    key_col: pdf[key_col].to_numpy(dtype=np.int64),
                    out_col: pd.array(
                        [
                            _dp(a, b)
                            for a, b in zip(pdf[series_col], pdf[ref_col])
                        ],
                        dtype="Int64",
                    ),
                }
            )
            yield out

    return df.select(key_col, series_col, ref_col).mapInPandas(_scan, schema=schema)
