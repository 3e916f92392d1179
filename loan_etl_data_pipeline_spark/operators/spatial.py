"""Grid-blocked spatial radius joins (EXT — no spatial support anywhere
in the reference, whose only keys are loan attributes).

The all-pairs "who is within distance r" question has the same shape as
near-dup detection: a quadratic predicate that must never run as a
cartesian product. The standard scale answer is grid blocking — the
spatial sibling of LSH banding (`operators/dedup.py`): bucket points
into r-sized cells, then candidates are only the pairs whose cells are
neighbors (a true pair within L2 distance r cannot be more than one
cell apart in either axis), and the exact integer distance predicate
verifies candidates. Cost is Σ(cell density²·9) instead of n² — linear
for bounded-density data; a pathological hot cell is the same skew as a
hot LSH band and takes the same remedies (salt the cell key, or cap and
quarantine the cell for a dense-block kernel, as semantic_dedup does).

Coordinates are int64 on purpose: exact cross-engine arithmetic
(dist² and cell ids replay bit-for-bit in any SQL engine), and any real
CRS quantizes losslessly to integer micro-degrees / millimeters. At
Earth scale the cell id generalizes to a geohash/S2 prefix — same join,
hierarchical key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def grid_radius_join(
    pts: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    *,
    radius: int,
    dist_col: str = "dist2",
) -> DataFrame:
    """All pairs (a, b), ``a.id < b.id``, with squared L2 distance
    ``<= radius²``. Returns (id_a, id_b, ``dist_col`` = exact int64
    squared distance).

    Plan: one side explodes into its 3×3 cell neighborhood (9 rows —
    a constant, not data fan-out), then ONE equality join on the cell
    key and the exact distance filter. Each true pair is emitted
    exactly once: it matches only at the single (dx, dy) equal to the
    cell delta, and the id ordering kills the mirror. No cartesian,
    no UDF, whole-stage codegen throughout.
    """
    if radius <= 0:
        raise ValueError(f"radius must be positive, got {radius}")
    a = pts.select(
        F.col(id_col).alias("__ida"),
        F.col(x_col).cast("long").alias("__xa"),
        F.col(y_col).cast("long").alias("__ya"),
    ).withColumns(
        {
            "__cxa": F.expr(f"__xa div {radius}"),
            "__cya": F.expr(f"__ya div {radius}"),
        }
    )
    # explode A into the 9 neighbor cells its partners could occupy
    offsets = F.expr(
        "explode(array("
        + ", ".join(
            f"struct({dx}L AS dx, {dy}L AS dy)"
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        )
        + "))"
    )
    a9 = a.select("*", offsets.alias("__off")).select(
        "__ida",
        "__xa",
        "__ya",
        (F.col("__cxa") + F.col("__off.dx")).alias("__cx"),
        (F.col("__cya") + F.col("__off.dy")).alias("__cy"),
    )
    b = pts.select(
        F.col(id_col).alias("__idb"),
        F.col(x_col).cast("long").alias("__xb"),
        F.col(y_col).cast("long").alias("__yb"),
    ).withColumns(
        {
            "__cx": F.expr(f"__xb div {radius}"),
            "__cy": F.expr(f"__yb div {radius}"),
        }
    )
    d2 = "(__xa - __xb) * (__xa - __xb) + (__ya - __yb) * (__ya - __yb)"
    return (
        a9.join(b, ["__cx", "__cy"])
        .filter(F.expr(f"__ida < __idb AND {d2} <= {radius} * {radius}L"))
        .select(
            F.col("__ida").alias("id_a"),
            F.col("__idb").alias("id_b"),
            F.expr(d2).cast("long").alias(dist_col),
        )
    )


def dbscan(
    pts: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    *,
    eps: int,
    min_pts: int,
) -> DataFrame:
    """Exact DBSCAN (Ester et al., KDD'96) as a composition of certified
    distributed pieces — the density-clustering complement of the
    centroid-based k-means (`operators/kmeans.py`): no k, finds
    arbitrary-shape clusters, labels sparse points noise.

    Decomposition (each stage already has a scale story):
    ``grid_radius_join`` builds the eps-neighbor pairs (never
    cartesian); a degree count classifies CORE points
    (|N_eps(p)| ≥ min_pts, self included — the paper's convention);
    core–core edges feed ``connected_components_two_phase`` (cluster
    id = min core id, diameter-independent rounds); BORDER points
    (non-core with a core neighbor) attach to the MIN cluster label
    among their core neighbors — the paper leaves this arbitrary, we
    pin it so the result is deterministic and SQL-replayable; the rest
    is NOISE (NULL cluster).

    Returns (id, cluster, role) for EVERY input point; role in
    {'core','border','noise'}.
    """
    from loan_etl_data_pipeline_spark.operators.graph import (
        connected_components_two_phase,
    )

    ids = pts.select(F.col(id_col).alias("id"))
    pairs = grid_radius_join(pts, id_col, x_col, y_col, radius=eps)
    bidir = pairs.select(
        F.col("id_a").alias("a"), F.col("id_b").alias("b")
    ).union(pairs.select(F.col("id_b").alias("a"), F.col("id_a").alias("b")))
    deg = bidir.groupBy("a").agg(F.count(F.lit(1)).alias("n"))
    core = (
        ids.join(deg, ids.id == deg.a, "left")
        .filter(F.coalesce(F.col("n"), F.lit(0)) + 1 >= min_pts)
        .select("id")
    )
    core_edges = (
        bidir.join(core.withColumnRenamed("id", "a"), "a")
        .join(core.withColumnRenamed("id", "b"), "b")
        .select("a", "b")
    )
    comps = connected_components_two_phase(core_edges, "a", "b")
    core_lab = core.join(comps, "id", "left").select(
        "id", F.coalesce(F.col("component"), F.col("id")).alias("cluster")
    )
    border = (
        bidir.join(core_lab.withColumnRenamed("id", "b"), "b")
        .join(core.withColumnRenamed("id", "a"), "a", "left_anti")
        .groupBy(F.col("a").alias("id"))
        .agg(F.min("cluster").alias("cluster"))
    )
    return (
        ids.join(core_lab.withColumnRenamed("cluster", "cl_core"), "id", "left")
        .join(border.withColumnRenamed("cluster", "cl_border"), "id", "left")
        .select(
            "id",
            F.coalesce(F.col("cl_core"), F.col("cl_border")).alias("cluster"),
            F.when(F.col("cl_core").isNotNull(), F.lit("core"))
            .when(F.col("cl_border").isNotNull(), F.lit("border"))
            .otherwise(F.lit("noise"))
            .alias("role"),
        )
    )
