"""Dominant direction of an embedding matrix by exact-int64 power
iteration — the distributed seed of PCA / embedding whitening
(Mu & Viswanath's all-but-the-top removes exactly this direction).

Spark has no distributed eigensolver outside MLlib's RowMatrix (whose
float accumulation is partition-order dependent and therefore
un-oracle-able). This is the pagerank stance applied to linear
algebra: quantize components to floor(x·1e6) int64 once, then run a
FIXED number of power-iteration rounds where every step — the
per-vector projection s_i = Σ_j q_ij·v_j, the per-dimension
back-projection u_j = Σ_i q_ij·s'_i, and the max-norm rescale — is
pure integer arithmetic, so the whole computation replays as unrolled
SQL CTEs with a full value oracle.

Two portability traps handled explicitly:
- Rescales divide SIGN-DECOMPOSED: ``sign(x)·(|x| div d)``. Both
  engines' SQL integer division truncates toward zero, but PYTHON's
  ``//`` floors — and the per-round model arithmetic runs driver-side
  in Python (``_tdiv`` pins truncation there). The SQL form mirrors
  the same sign decomposition so all three implementations share ONE
  stated semantics instead of relying on per-language defaults.
- s_i is pre-shrunk by 1e6 before the back-projection so u_j stays
  inside int64 up to ~1e5 vectors; past that the u-accumulation swaps
  to decimal(38,0) sums (the SCALE.md ladder) with the divisions
  unchanged.

The per-round model (one int64 per dimension) lives on the driver
between rounds — the same bounded-model contract as IVF centroids and
the bigram-LM weights (dims ≤ a few thousand; NOT per-row state).
Fan-out per round: one (id,dim)-exploded aggregation pair keyed on id
then dim — two shuffles of the exploded frame per round, nothing
quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

SCALE = 1_000_000


def _tdiv(x: int, d: int) -> int:
    """Truncating integer division (toward zero) — the semantics both
    engines are steered to via sign decomposition."""
    return -((-x) // d) if x < 0 else x // d


def power_iteration_topdir(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    dim: int,
    iters: int = 3,
) -> DataFrame:
    """Return (dim, v) — the dominant-direction estimate after
    ``iters`` fixed power-iteration rounds, as int64 components at
    scale 1e6 under max-norm (the largest |component| lands near 1e6).
    Deterministic from the all-ones start; more rounds → closer to the
    top singular vector (fixed rounds keep it SQL-replayable — the
    pagerank/kcore unrolling stance).
    """
    if dim < 1 or iters < 1:
        raise ValueError(f"dim and iters must be >= 1, got {dim}/{iters}")
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
    return dominant_direction_of_quantized(eq, dim=dim, iters=iters)


def dominant_direction_of_quantized(
    eq: DataFrame, *, dim: int, iters: int = 3
) -> DataFrame:
    """Power-iteration core over an already-quantized exploded frame
    ``(id, j, q)`` — the deflation entry point: feed it the
    ``remove_common_direction`` output (renamed q) to get the SECOND
    principal direction, and so on down the spectrum. Same contract as
    :func:`power_iteration_topdir`."""
    if dim < 1 or iters < 1:
        raise ValueError(f"dim and iters must be >= 1, got {dim}/{iters}")
    spark = eq.sparkSession
    v = [SCALE] * dim  # all-ones start at scale 1e6 — sign-deterministic
    sgn_sql = "CASE WHEN {x} >= 0 THEN ({x}) div {d} ELSE -((-({x})) div {d}) END"
    for _ in range(iters):
        varr = F.array(*[F.lit(int(c)) for c in v])
        s = eq.groupBy("id").agg(
            F.sum(F.col("q") * F.element_at(varr, F.col("j").cast("int")))
            .alias("s")
        )
        sp = s.select(
            "id", F.expr(sgn_sql.format(x="s", d=SCALE)).alias("sp")
        )
        u_rows = (
            eq.join(sp, "id")
            .groupBy("j")
            .agg(F.sum(F.col("q") * F.col("sp")).alias("u"))
            .collect()
        )
        u = {r["j"]: r["u"] for r in u_rows}
        uv = [int(u.get(j + 1, 0)) for j in range(dim)]
        m = max(abs(c) for c in uv)
        d = m // SCALE + 1  # >= 1; brings components back to ~±1e6
        v = [_tdiv(c, d) for c in uv]
    from loan_etl_data_pipeline_spark.functions.localframe import values_frame

    return values_frame(
        spark, [(j + 1, int(v[j])) for j in range(dim)], f"{'dim'} int, v bigint"
    ).select(F.col("dim").cast("bigint").alias("dim"), "v")


def remove_common_direction(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    direction: DataFrame,
    *,
    dim: int,
) -> DataFrame:
    """All-but-the-top removal, exact-int64: subtract each vector's
    projection onto ``direction`` (the (dim, v) output of
    :func:`power_iteration_topdir`), returning (id, j, xq_corrected)
    at scale 1e6 — the corrected matrix the ANN/near-dup stack can
    re-quantize from.

    x'_j = x_j − ((x·v)/(v·v))·v_j, computed as staged integer
    divisions (c = tdiv(1000·(x·v), v·v), then tdiv(c·v_j, 1000)) so
    no intermediate leaves int64 and both engines replay it exactly —
    same sign-decomposed-division discipline as the iteration itself.
    The direction (≤ a few thousand ints) broadcasts; the corpus
    never shuffles at all — this is a map-side projection.
    """
    v_rows = direction.collect()
    v = {int(r["dim"]): int(r["v"]) for r in v_rows}
    if len(v) != dim:
        raise ValueError(f"direction has {len(v)} dims, expected {dim}")
    vv = sum(c * c for c in v.values())
    varr = F.array(*[F.lit(v[j + 1]) for j in range(dim)])
    eq = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(vec_col).alias("pos", "x"),
    ).select(
        "id",
        (F.col("pos") + 1).alias("j"),
        F.floor(F.col("x").cast("double") * SCALE).cast("bigint").alias("q"),
    )
    sgn = "CASE WHEN {x} >= 0 THEN ({x}) div {d} ELSE -((-({x})) div {d}) END"
    dots = eq.groupBy("id").agg(
        F.sum(F.col("q") * F.element_at(varr, F.col("j").cast("int")))
        .alias("d")
    )
    c = dots.select(
        "id", F.expr(sgn.format(x="1000 * d", d=vv)).alias("c")
    )
    arr_sql = "array(" + ",".join(str(v[j + 1]) for j in range(dim)) + ")"
    proj = sgn.format(
        x=f"c * element_at({arr_sql}, cast(j as int))", d=1000
    )
    return (
        eq.join(F.broadcast(c), "id")
        .select("id", "j", (F.col("q") - F.expr(proj)).alias("xq_corrected"))
    )
