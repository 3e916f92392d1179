"""Data-quality constraint checking — one scan, one row per rule.

The ETL gate the reference never had (its pipeline silently null-fills
and ships — reference: airflow/dags/etl/pyspark_etl.py:14-21): declare
constraints, get per-rule violation counts, fail the run or route to
quarantine on `passed = false`.

Every rule compiles to an aggregate EXPRESSION, so any number of rules
over a 100 TB table costs exactly ONE scan with partial aggregation
(`unique` adds a count-distinct Expand over the same pass). The result
unpivots to (rule, violations, passed) rows — small, loggable, and
SQL-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F


def not_null(col: str) -> tuple[str, Column]:
    """Violations = rows where ``col`` is null."""
    return (
        f"not_null({col})",
        F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)),
    )


def unique(cols: list[str] | str) -> tuple[str, Column]:
    """Violations = surplus rows beyond one per distinct key
    (null-keyed rows count as a key, matching SQL DISTINCT)."""
    cols = [cols] if isinstance(cols, str) else list(cols)
    return (
        f"unique({','.join(cols)})",
        F.count(F.lit(1)) - F.countDistinct(*[F.struct(*cols)]),
    )


def in_range(col: str, lo, hi) -> tuple[str, Column]:
    """Violations = non-null rows outside [lo, hi]."""
    c = F.col(col)
    return (
        f"in_range({col},{lo},{hi})",
        F.sum(F.when(c.isNotNull() & ~c.between(lo, hi), 1).otherwise(0)),
    )


def accepted_values(col: str, values: list) -> tuple[str, Column]:
    """Violations = non-null rows outside the accepted set."""
    c = F.col(col)
    return (
        f"accepted_values({col})",
        F.sum(F.when(c.isNotNull() & ~c.isin(*values), 1).otherwise(0)),
    )


def matches(name: str, predicate: Column) -> tuple[str, Column]:
    """Custom rule: violations = rows where ``predicate`` is false/null."""
    return (
        name,
        F.sum(F.when(F.coalesce(predicate, F.lit(False)), 0).otherwise(1)),
    )


def check_constraints(
    df: DataFrame, rules: list[tuple[str, Column]]
) -> DataFrame:
    """Run all rules in one aggregate pass.

    Output: (rule string, violations bigint, passed boolean), one row
    per rule in declaration order (order restored by sorting on the
    rule name downstream if needed — the unpivot itself is row-local).
    """
    if not rules:
        raise ValueError("check_constraints: no rules given")
    names = [n for n, _ in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names: {names}")
    agged = df.agg(
        *[expr.cast("bigint").alias(f"__r{i}") for i, (_, expr) in enumerate(rules)]
    )
    # rule names are interpolated into SQL string literals — double any
    # single quote so a name like "price isn't negative" can't break
    # parsing (or inject expression text) via the stack() call.
    stack_args = ", ".join(
        "'{}', __r{}".format(n.replace("'", "''"), i) for i, n in enumerate(names)
    )
    return agged.select(
        F.expr(f"stack({len(rules)}, {stack_args}) as (rule, violations)")
    ).select(
        "rule",
        F.coalesce(F.col("violations"), F.lit(0)).alias("violations"),
        (F.coalesce(F.col("violations"), F.lit(0)) == 0).alias("passed"),
    )


def fk_orphans(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    *,
    relationship: str | None = None,
) -> DataFrame:
    """Referential-integrity audit for one FK edge: ONE row
    ``(relationship, n_child, n_orphans)`` where an orphan is a
    NON-NULL child key with no matching parent (NULL keys are not
    orphans — SQL FK semantics).

    One pass: child keys left-join the DISTINCT parent key set and a
    single aggregate counts misses — no separate anti-join + count
    actions. At 100 TB the parent key set either broadcasts (dimension
    tables) or co-shuffles on the key (fact→fact edges); the output is
    always one row, so auditing every edge of a schema is a union of
    tiny frames (see q_fk_audit).
    """
    name = relationship or f"{child_key}->{parent_key}"
    ck = child.select(F.col(child_key).alias("__k")).filter(
        F.col("__k").isNotNull()
    )
    pk = (
        parent.select(F.col(parent_key).alias("__k"))
        .filter(F.col("__k").isNotNull())
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    return ck.join(pk, "__k", "left").agg(
        F.lit(name).alias("relationship"),
        F.count(F.lit(1)).cast("bigint").alias("n_child"),
        F.sum(F.when(F.col("__hit").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_orphans"),
    )


def iqr_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    *,
    factor: float = 1.5,
) -> DataFrame:
    """Per-group Tukey-fence outlier summary over exact cents.

    The classic "flag numeric rows outside [Q1 − f·IQR, Q3 + f·IQR]"
    screen, per group. Quartiles are computed over bigint cents
    (``floor(x*100)``) so the rank-select + single interpolation is
    bit-identical to DuckDB's ``quantile_cont`` (same scheme
    q_quantiles certifies); the fences are then a fixed-order double
    expression of those exact quartiles. ``factor`` should be an
    exactly-representable binary64 (1.5, 1.25, 2.0 ...) if
    cross-engine bit-parity matters.

    Plan: ONE pass — quartiles and the flag counts come from the same
    grouped aggregate via percentile + conditional re-aggregation:
    group stats first (one shuffle on ``group_col``), then a broadcast
    join back onto the scan for the count pass. Two scans of the fact
    table, no second shuffle: at 100 TB the stats table is
    group-cardinality-sized and always broadcastable.

    Output: (group, q1, q3, lo_fence, hi_fence, n_rows, n_outliers).
    """
    cents = F.floor(F.col(value_col) * 100).cast("bigint")
    q = F.expr(
        f"percentile(cast(floor({value_col}*100) as bigint), array(0.25, 0.75))"
    )
    stats = df.groupBy(group_col).agg(
        (q[0] / 100).alias("q1"), (q[1] / 100).alias("q3")
    )
    lo = F.col("q1") - F.lit(factor) * (F.col("q3") - F.col("q1"))
    hi = F.col("q3") + F.lit(factor) * (F.col("q3") - F.col("q1"))
    stats = stats.withColumn("lo_fence", lo).withColumn("hi_fence", hi)
    flagged = (
        df.select(group_col, (cents / 100).alias("__v"))
        .join(F.broadcast(stats), group_col)
        .groupBy(group_col, "q1", "q3", "lo_fence", "hi_fence")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.when(
                    (F.col("__v") < F.col("lo_fence"))
                    | (F.col("__v") > F.col("hi_fence")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
    )
    return flagged.select(
        group_col, "q1", "q3", "lo_fence", "hi_fence", "n_rows", "n_outliers"
    )


def observe_metrics(
    df: DataFrame, name: str, metrics: dict[str, Column]
) -> tuple[DataFrame, "object"]:
    """Attach FREE in-flight metrics to a DataFrame via Spark's
    Observation API: the aggregates piggyback on whatever action the
    caller was already running (a parquet write, a collect), costing
    ZERO extra scans — vs the separate `df.count()` / check_constraints
    pass, which re-reads the input. The production pattern: observe
    row counts and null/violation counters ON the write itself, then
    fail-or-alert from the returned Observation after the action.

    Returns ``(observed_df, observation)``; read
    ``observation.get`` (dict) only AFTER an action ran the plan.
    Caveats inherent to the API (documented, not worked around):
    metrics must be aggregate expressions with no distinct, and the
    values reflect the rows the ACTION actually processed — a limit(k)
    action observes k rows, not the table.
    """
    from pyspark.sql import Observation

    if not metrics:
        raise ValueError("metrics must not be empty")
    obs = Observation(name)
    out = df.observe(obs, *[c.alias(n) for n, c in metrics.items()])
    return out, obs


def fd_violations(
    df: DataFrame,
    determinant: list[str] | str,
    dependent: str,
) -> DataFrame:
    """Functional-dependency audit: does ``determinant → dependent``
    hold? Returns ONE row ``(fd, n_groups, n_violating_groups,
    n_violating_rows)`` where a violating group is a determinant value
    mapping to >1 distinct dependent value (NULL counts as a value —
    a determinant that sometimes resolves and sometimes doesn't is a
    violation worth seeing).

    The in-table sibling of fk_orphans' between-table audit and the
    discovery half of profile-driven schema inference: run it over
    candidate FDs (zip→city, key→status, id→n_chars) to find which
    "should-be-derivable" columns actually drift. One determinant-keyed
    aggregate with map-side partial aggregation, then a 1-row rollup —
    at 100 TB the wide row count never leaves the executors.
    """
    lhs = [determinant] if isinstance(determinant, str) else list(determinant)
    name = ",".join(lhs) + "->" + dependent
    per_group = df.groupBy(*lhs).agg(
        F.countDistinct(dependent).alias("__nd"),
        F.sum(
            F.when(F.col(dependent).isNull(), 1).otherwise(0)
        ).alias("__nulls"),
        F.count(F.lit(1)).alias("__n"),
    )
    # a group violates when it has >1 distinct non-null value, or a mix
    # of null and non-null (countDistinct ignores NULLs, so add them in)
    viol = (F.col("__nd") + F.when(F.col("__nulls") > 0, 1).otherwise(0)) > 1
    return per_group.agg(
        F.lit(name).alias("fd"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum(F.when(viol, 1).otherwise(0)).cast("bigint").alias(
            "n_violating_groups"
        ),
        F.sum(F.when(viol, F.col("__n")).otherwise(0)).cast("bigint").alias(
            "n_violating_rows"
        ),
    )


def table_fingerprint(
    df: DataFrame, canonical: Column, *, bucket_hex_chars: int = 1
) -> DataFrame:
    """Bucketed order-insensitive table checksum — the replication /
    cross-engine validation primitive ("did the copy arrive intact?").

    ``canonical`` must be a deterministic STRING rendering of the row
    (caller quantizes floats to ints and formats timestamps — raw
    float/timestamp casts differ across engines). Each row contributes
    its 40-bit md5 coordinate; per-bucket int64 sums + counts are the
    fingerprint. Order-insensitive by construction (integer addition
    commutes), so any partitioning/engine that holds the same multiset
    of rows produces the identical frame.

    Scale: one partial+final agg, output 16^bucket_hex_chars rows.
    Int64 bound: ≲ 8e6 rows per bucket (2^40·8e6 < 2^63) — raise
    ``bucket_hex_chars`` (16× more buckets per char) as tables grow;
    at 100 TB use 4-5 chars and compare fingerprints shard-wise.
    """
    h = F.md5(canonical)
    coord = F.conv(F.substring(h, 1, 10), 16, 10).cast("bigint")
    return (
        df.select(
            F.substring(h, 33 - bucket_hex_chars, bucket_hex_chars).alias(
                "bucket"
            ),
            coord.alias("coord"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("coord").alias("checksum"),
        )
    )


def isotonic_fit(
    bins: DataFrame,
    x_col: str,
    sum_col: str,
    n_col: str,
    *,
    scale: int = 10**9,
) -> DataFrame:
    """Exact isotonic (non-decreasing) regression over an aggregated
    bin grid — pool-adjacent-violators (PAVA), the standard fix
    applied after a calibration audit flags a non-monotone
    reliability curve: fitted rates are weighted pool means and the
    L2-isotonic solution is UNIQUE, so any valid merge order lands on
    the same pools (which is why the oracle's merge-first-violation
    rounds must agree with this stack implementation exactly).

    Arithmetic is exact end to end: pool means stay (Σy, n) integer
    pairs, violations compare by cross-multiplication, and the fitted
    value quantizes once at the end (``fitted = (Σy·scale) div n``).

    The bin grid is BOUNDED BY CONTRACT (a discount/price/score grid —
    data-size-free, the q_ses_level regime): the distributed stage is
    the caller's aggregation; the fit itself runs driver-side on the
    collected grid, exactly like a broadcast model's driver-side idf.
    Returns (x_col, pool_lo, fitted9) for every input bin.
    """
    rows = sorted(
        (r[x_col], int(r[sum_col]), int(r[n_col])) for r in bins.collect()
    )
    if not rows:
        raise ValueError("isotonic_fit needs at least one bin")
    if any(n <= 0 for _, _, n in rows):
        raise ValueError("isotonic_fit: every bin needs n > 0")
    # stack PAVA: each pool = (lo_x, members, sy, n); merge while the
    # top pool's mean exceeds the incoming one's (cross-multiplied)
    pools: list[list] = []
    for x, sy, n in rows:
        cur = [x, [x], sy, n]
        while pools and pools[-1][2] * cur[3] > cur[2] * pools[-1][3]:
            prev = pools.pop()
            cur = [prev[0], prev[1] + cur[1], prev[2] + cur[2], prev[3] + cur[3]]
        pools.append(cur)
    out = [
        (x, lo, (sy * scale) // n)
        for lo, members, sy, n in pools
        for x in members
    ]
    # grid type follows the input (a score grid may be DOUBLE/STRING —
    # the docstring's contract), only the derived columns are pinned
    xt = bins.schema[x_col].dataType.simpleString()
    from loan_etl_data_pipeline_spark.functions.localframe import values_frame

    return values_frame(
        bins.sparkSession, out, f"{x_col} {xt}, pool_lo {xt}, fitted9 bigint"
    )
