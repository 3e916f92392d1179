"""Iterative graph algorithms on DataFrames: connected components.

Near-dup pairs (MinHash/SimHash/Jaccard — operators/dedup.py) are
*edges*; what a dedup pipeline actually needs is the *cluster*: keep
one document per connected component. Spark has no built-in CC (that
lives in GraphFrames/GraphX), so this is the DataFrame-native
min-label-propagation form:

    label(v) ← min(label(v), min over neighbors' labels), repeat

Each iteration is one join + one partial-aggregated groupBy (both keyed
on node id), and the lineage is truncated per iteration with
``localCheckpoint`` — without that, the plan doubles every round and
the driver dies planning iteration ~15 long before the data hurts.
Convergence is detected by the sum of labels (labels only ever
decrease, so the sum is a strictly decreasing integer until the fixed
point) — one cheap action per iteration, no self-join diff.

Rounds needed = graph diameter. Near-dup clusters are small and dense
(diameter 2-3 on real corpora), so this converges in a handful of
rounds; for planet-scale general graphs you would switch to the
large-star/small-star variant (Kiveris et al., "Connected Components
in MapReduce and Beyond"), which is the same DataFrame shape with two
alternating relabel rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    max_iter: int = 30,
) -> DataFrame:
    """(id, component) for every node in ``edges``; component = min node
    id reachable. Nodes absent from ``edges`` (singletons) are absent
    from the output — union them in as label=id if needed.
    """
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        e.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    prev_sum = labels.agg(F.sum(F.col("label").cast("decimal(38,0)"))).collect()[0][0]

    for _ in range(max_iter):
        nbr_min = (
            e.join(labels, e.b == labels.id)
            .groupBy("a")
            .agg(F.min("label").alias("nbr_label"))
        )
        labels = (
            labels.join(nbr_min, labels.id == nbr_min.a, "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        cur_sum = labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)"))
        ).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations "
            "(diameter too large — use the large-star/small-star variant)"
        )
    return labels.select("id", F.col("label").alias("component"))
