"""Exact-int64 k-means (Lloyd rounds) with a full value oracle.

The engine's clustering consumers (SemDeDup cells, IVF routing) train
with float Lloyd iterations whose sums are partition-order dependent —
correct in practice, but only rows-only checkable. This variant is the
pagerank/power-iteration stance applied to clustering: quantize
components to floor(x·1e6) int64 once, init centroids from the k
lowest-id vectors (no RNG), and run FIXED Lloyd rounds where
assignment (integer squared distances, argmin with cluster-id
tie-break) and update (sign-decomposed integer-division means;
clusters that go empty keep their previous centroid) are pure integer
arithmetic — so the whole iterative computation replays as generated,
unrolled SQL CTEs.

Use it when the cluster structure must be auditable/reproducible
bit-for-bit (curation decisions that feed deletions); the float Lloyd
in operators/ivf.py remains the throughput path for routing-quality
training where exactness is not the contract.

Scale: per round, one (id,dim)-exploded k-way distance aggregate (k
sums in a single pass over the exploded frame — never k scans) and one
(cluster,dim) mean aggregate whose k·dim rows come to the driver (the
bounded-model contract shared with IVF centroids / power iteration).
Overflow: |q| ≤ 1e6·|x|; squared-diff sums ≤ dim·4e12·1e6-ish — int64
holds to ~1e5-dim·unit-norm; cluster sums ≤ n·1e6 (decimal ladder past
~1e12 rows per cluster).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from loan_etl_data_pipeline_spark.operators.pca import SCALE, _tdiv


def kmeans_int(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    dim: int,
    k: int,
    iters: int = 2,
) -> DataFrame:
    """Return (id, cluster) after ``iters`` exact Lloyd rounds with
    deterministic lowest-k-id init. Cluster labels are 0-based init
    positions (ascending id)."""
    if dim < 1 or k < 1 or iters < 1:
        raise ValueError(f"dim/k/iters must be >= 1, got {dim}/{k}/{iters}")
    eq = (
        df.select(
            F.col(id_col).alias("id"),
            F.posexplode(vec_col).alias("pos", "x"),
        )
        .select(
            "id",
            (F.col("pos") + 1).alias("j"),
            F.floor(F.col("x").cast("double") * SCALE).cast("bigint").alias("q"),
        )
        .localCheckpoint(eager=False)
    )
    init_ids = [
        r["id"]
        for r in df.select(F.col(id_col).alias("id"))
        .orderBy("id")
        .limit(k)
        .collect()
    ]
    if len(init_ids) < k:
        raise ValueError(f"need >= {k} rows, got {len(init_ids)}")
    init_rows = (
        eq.filter(F.col("id").isin(init_ids)).collect()
    )
    id_to_cluster = {vid: m for m, vid in enumerate(sorted(init_ids))}
    cent = {}  # (cluster, j) -> int
    for r in init_rows:
        cent[(id_to_cluster[r["id"]], r["j"])] = int(r["q"])

    assign = None
    for _ in range(iters):
        def _dist(m):
            diff = F.col("q") - F.element_at(
                F.array(*[F.lit(cent[(m, j + 1)]) for j in range(dim)]),
                F.col("j").cast("int"),
            )
            # diff * diff, NOT diff ** 2 — Spark's power operator
            # returns double and would break the exact-integer contract
            return F.sum(diff * diff).alias(f"d{m}")

        dists = [_dist(m) for m in range(k)]
        dd = eq.groupBy("id").agg(*dists)
        # argmin with cluster-id tie-break, as a least()-free when-chain
        best = F.lit(0)
        best_d = F.col("d0")
        for m in range(1, k):
            cond = F.col(f"d{m}") < best_d
            best = F.when(cond, F.lit(m)).otherwise(best)
            best_d = F.when(cond, F.col(f"d{m}")).otherwise(best_d)
        assign = dd.select("id", best.cast("bigint").alias("cluster"))
        upd = (
            eq.join(assign, "id")
            .groupBy("cluster", "j")
            .agg(
                F.sum("q").alias("s"),
                F.count(F.lit(1)).cast("bigint").alias("n"),
            )
            .collect()
        )
        new_cent = dict(cent)  # empty clusters keep previous centroids
        for r in upd:
            new_cent[(int(r["cluster"]), int(r["j"]))] = _tdiv(
                int(r["s"]), int(r["n"])
            )
        cent = new_cent
    return assign.select(F.col("id"), F.col("cluster"))


def farthest_first(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    dim: int,
    k: int,
) -> DataFrame:
    """Gonzalez farthest-first traversal (2-approximate k-center), the
    diversity-coreset selector for training-data pruning: start from
    the MIN-id vector (no RNG), then k−1 times pick the point whose
    squared distance to the chosen set is largest (min-id tie-break)
    and fold it into the running min-distance column. Returns
    (pos, id, radius) — radius is the chosen point's exact int64
    squared distance to the prior set (pos 1 gets 0), i.e. the
    coverage radius curve that says how fast diversity saturates.

    Everything is exact integer (quantized components, diff·diff
    distances, integer min/argmax), so the whole k-round traversal
    replays as generated unrolled SQL. Per round: one map-side
    distance projection against the newly chosen vector (a dim-int
    broadcast literal — the bounded-model contract) + one
    TakeOrdered(1); the running d_min column carries forward with
    lineage cut per round.
    """
    if dim < 1 or k < 1:
        raise ValueError(f"dim/k must be >= 1, got {dim}/{k}")
    eq = (
        df.select(
            F.col(id_col).alias("id"),
            F.posexplode(vec_col).alias("pos", "x"),
        )
        .select(
            "id",
            (F.col("pos") + 1).alias("j"),
            F.floor(F.col("x").cast("double") * SCALE).cast("bigint").alias("q"),
        )
        .localCheckpoint(eager=False)
    )
    spark = df.sparkSession

    def vec_of(vid):
        rows = eq.filter(F.col("id") == vid).collect()
        return {int(r["j"]): int(r["q"]) for r in rows}

    def dist_to(vec):
        arr = F.array(*[F.lit(vec.get(j + 1, 0)) for j in range(dim)])
        diff = F.col("q") - F.element_at(arr, F.col("j").cast("int"))
        return F.sum(diff * diff)

    first = eq.agg(F.min("id").alias("m")).collect()[0]["m"]
    if first is None:
        raise ValueError("empty input")
    chosen = [(1, first, 0)]
    dmin = (
        eq.groupBy("id").agg(dist_to(vec_of(first)).alias("dmin"))
        .localCheckpoint(eager=False)
    )
    for pos in range(2, k + 1):
        top = (
            dmin.orderBy(F.desc("dmin"), F.asc("id")).limit(1).collect()[0]
        )
        chosen.append((pos, top["id"], int(top["dmin"])))
        if pos == k:
            break
        newd = eq.groupBy("id").agg(dist_to(vec_of(top["id"])).alias("d2"))
        dmin = (
            dmin.join(newd, "id")
            .select("id", F.least("dmin", "d2").alias("dmin"))
            .localCheckpoint(eager=False)
        )
    from loan_etl_data_pipeline_spark.functions.localframe import values_frame

    return values_frame(
        spark, chosen, "pos long, id long, radius long"
    ).select(
        F.col("pos").cast("bigint").alias("pos"),
        F.col("id").cast("bigint").alias("id"),
        F.col("radius").cast("bigint").alias("radius"),
    )
