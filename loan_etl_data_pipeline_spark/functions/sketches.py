"""Mergeable sketch aggregates: HLL distinct counts that pre-aggregate.

``q_count_distinct`` computes exact distincts — the right default, but
at 100 TB an exact distinct shuffles every (group, user) pair once per
query. Datasketches HLL (built into Spark as ``hll_sketch_agg`` /
``hll_union_agg`` / ``hll_sketch_estimate``) replaces that with a
fixed-size binary sketch per group that is **mergeable**: build daily
(or per-partition) sketch tables once, then answer any
distinct-over-any-span question by unioning kilobyte sketches instead
of rescanning raw events. Standard error ~1.04/sqrt(2^lg_k) ≈ 1.6% at
the default lg_k=12 (4 KB per sketch).

No DuckDB oracle — DuckDB's approx_count_distinct is a different HLL
implementation with different estimates — so verification is
property-based (tests/test_sketches.py): estimates within a stated
error of exact, and split-then-merge equals the single-pass sketch
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def distinct_sketches(
    df: DataFrame,
    group_cols: list[str] | str,
    value_col: str,
    *,
    lg_k: int = 12,
) -> DataFrame:
    """One HLL sketch of ``value_col``'s distincts per group.

    This is the *build* side you would persist (e.g. one row per
    (day, event_type)); shuffle payload is the fixed-size sketch, and
    the partial aggregation combines sketches map-side exactly like any
    algebraic agg.
    """
    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sketch")
    )


def merge_sketches(
    df: DataFrame, group_cols: list[str] | str, *, sketch_col: str = "sketch"
) -> DataFrame:
    """Union sketch rows down to coarser groups (the *query* side)."""
    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    return df.groupBy(*group_cols).agg(
        F.hll_union_agg(sketch_col).alias("sketch")
    )


def estimate(df: DataFrame, *, sketch_col: str = "sketch", alias: str = "approx_distinct") -> DataFrame:
    """Materialize the distinct-count estimates for sketch rows."""
    return df.withColumn(
        alias, F.hll_sketch_estimate(sketch_col).cast("bigint")
    ).drop(sketch_col)


def sliding_distinct(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    *,
    slide: str = "1 hour",
    width_slides: int = 6,
    lg_k: int = 12,
) -> DataFrame:
    """(win_start, approx_distinct): distinct values over a TRAILING
    window of ``width_slides`` tumbles, one row per observed tumble.

    The mergeable-sketch window pattern: raw rows are touched exactly
    once (the per-tumble ``hll_sketch_agg``, partial-aggregated
    map-side); the sliding windows then merge SKETCHES with
    ``hll_union_agg`` over a rows-frame — kilobytes per tumble instead
    of re-scanning every row ``width_slides`` times, which is what a
    naive per-window COUNT DISTINCT costs. The tumble-level window
    runs on a single partition BY DESIGN: its input is already one
    fixed-size sketch per tumble (~4 KB at lg_k=12), thousands of rows
    at any corpus size — never the raw data.

    Semantics note: the frame is the trailing ``width_slides``
    OBSERVED tumbles; tumbles with zero events occupy no row, so a gap
    in the data widens the time span (densify the spine upstream if
    calendar alignment matters). HLL union is lossless for same-lg_k
    sketches — merged estimates are identical to sketching the raw
    union, which is what the test pins.
    """
    tumble = df.groupBy(F.window(ts_col, slide).alias("w")).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sketch")
    )
    from pyspark.sql import Window

    frame = Window.orderBy(F.col("w.start")).rowsBetween(-(width_slides - 1), 0)
    return tumble.select(
        F.col("w.start").alias("win_start"),
        F.hll_sketch_estimate(F.hll_union_agg("sketch").over(frame))
        .cast("bigint")
        .alias("approx_distinct"),
    )


def cms_build(
    df: DataFrame,
    key_col: str,
    *,
    depth: int = 4,
    width: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """Count–min sketch of a key stream: a (row, col, cnt) counter
    table with depth·width cells — the mergeable frequency sketch
    (Cormode–Muthukrishnan) that answers "how often did key x occur?"
    within εN (ε = e/width) using O(depth·width) space per stream,
    where an exact per-key table is unbounded.

    Each of the ``depth`` rows hashes the key with a different salt
    through the engine's shared md5 coordinate
    (functions/splits.md5_coord48 — the SAME formula the DuckDB
    oracles inline), so unlike library sketches the ENTIRE structure
    is cross-engine value-exact: build, merge, and point queries all
    carry full SQL oracles.

    One groupBy over the salted-exploded stream (depth× fan-out,
    map-side combined to ≤ depth·width rows per partition).
    ``weight_col`` aggregates integer weights instead of occurrence
    counts. Merge = union + re-aggregate (cms_merge).
    """
    if depth < 1 or width < 1:
        raise ValueError(f"depth/width must be >= 1, got {depth}/{width}")
    from loan_etl_data_pipeline_spark.functions.splits import md5_coord48

    w = (
        F.col(weight_col).cast("bigint")
        if weight_col
        else F.lit(1).cast("bigint")
    )
    # ONE scan: per row, explode an array of (row, col) structs — a
    # depth-way union of full projections would scan the stream depth
    # times at 100 TB for the same fan-out
    cells = F.array(
        *[
            F.struct(
                F.lit(d).alias("row"),
                (md5_coord48(key_col, salt=f"cms{d}|") % width).alias("col"),
            )
            for d in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"), w.alias("__w"))
        .select("c.row", "c.col", "__w")
        .groupBy("row", "col")
        .agg(F.sum("__w").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge count–min sketches built with the SAME (depth, width):
    cell-wise addition — union + one re-aggregate, the update-then-
    merge shape shared with the HLL sketches above."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))


def cms_query(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    *,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-query frequencies: per key, min over the depth rows of
    its hashed cell — an OVERestimate (≥ true count always; ≤ true +
    εN with probability 1 − (1/2)^depth). Keys join the depth·width-
    cell sketch on (row, col): the sketch side is broadcast-sized by
    construction. Returns (key_col, est)."""
    from loan_etl_data_pipeline_spark.functions.splits import md5_coord48

    probes = [
        keys.select(
            F.col(key_col),
            F.lit(d).alias("row"),
            (md5_coord48(key_col, salt=f"cms{d}|") % width).alias("col"),
        )
        for d in range(depth)
    ]
    out = probes[0]
    for p in probes[1:]:
        out = out.unionByName(p)
    return (
        out.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("bigint").alias("est"))
    )
