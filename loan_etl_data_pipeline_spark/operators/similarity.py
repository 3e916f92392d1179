"""Similarity search over embedding columns (EXT E3 — SURVEY.md §2 Part B).

The embeddings table is ``(vec_id bigint, embedding array<float>, label
int)``. Three tiers:

- :func:`cosine_topk_bruteforce` — exact top-k via broadcast cross join +
  array arithmetic + per-query window. The correctness baseline; right
  answer whenever the *query* side is small (the common case: a batch of
  probe vectors against a 100 TB corpus — the corpus side streams, the
  query side broadcasts, no corpus shuffle at all).
- :func:`cosine_neardup_pairs` — all pairs above a similarity threshold
  (embedding-space near-dup detection).
- :func:`lsh_topk` — the scale path: random-hyperplane signature →
  Hamming-bucket candidate join → exact re-rank of candidates only.

Determinism: cosine is computed as exact integer sums of
``floor((x*y)*1e12)`` picowei units — one IEEE multiply per element and
a tie-free floor are bit-identical in any engine and any accumulation
order, so rankings (and the DuckDB oracle comparison) are exact. See
queries.py module docstring for why naive double sums / decimal casts
are not portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F

#: scaled-integer cosine fragments shared with the SQL oracles
_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(FLOOR((x * y) * 1e12) AS BIGINT)), "
    "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
)


def _cosine_expr(a: str, b: str, na: str, nb: str):
    """cos = (dot/1e12) / (sqrt(na) * sqrt(nb)) — all doubles, fixed op order."""
    dot = _DOT.format(a=a, b=b)
    return F.expr(
        f"(CAST({dot} AS DOUBLE) / 1e12) / (sqrt({na}) * sqrt({nb}))"
    )


def _with_norm(df: DataFrame, vec_col: str, out: str) -> DataFrame:
    """Attach ||v||² as a double computed from exact scaled-integer sums."""
    sq = _DOT.format(a=vec_col, b=vec_col)
    return df.withColumn(out, F.expr(f"CAST({sq} AS DOUBLE) / 1e12"))


def cosine_topk_bruteforce(
    queries_df: DataFrame,
    corpus_df: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Plan shape: broadcast(queries) × corpus → narrow cosine projection →
    window top-k partitioned by query. The corpus is scanned once with
    no shuffle; the only shuffle is the (n_queries × corpus) candidate
    stream hashed by query id for the top-k, and Catalyst turns the
    row_number filter into a per-partition top-k under AQE.

    Output: (query_id, neighbor_id, cosine, rank); self-pairs excluded;
    ties broken by neighbor_id for determinism.
    """
    q = queries_df.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("q_vec"),
    )
    q = _with_norm(q, "q_vec", "q_norm")
    c = corpus_df.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("c_vec"),
    )
    c = _with_norm(c, "c_vec", "c_norm")
    pairs = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", _cosine_expr("q_vec", "c_vec", "q_norm", "c_norm"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def cosine_neardup_pairs(
    df: DataFrame,
    *,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All embedding pairs with cosine >= threshold (near-dup detection).

    O(n²) candidate space — correct baseline for verification; at corpus
    scale run :func:`lsh_topk`-style bucketing first and only pair within
    buckets.
    """
    v = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    v = _with_norm(v, "vec", "norm")
    a = v.select(
        F.col("id").alias("id_a"), F.col("vec").alias("vec_a"), F.col("norm").alias("norm_a")
    )
    b = v.select(
        F.col("id").alias("id_b"), F.col("vec").alias("vec_b"), F.col("norm").alias("norm_b")
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", _cosine_expr("vec_a", "vec_b", "norm_a", "norm_b"))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


#: deterministic pseudo-random hyperplanes: plane p, dim d weight derived
#: from a fixed LCG — reproducible across runs/clusters with no RNG state.
def _hyperplane(dim: int, plane: int) -> list[float]:
    out = []
    state = (plane + 1) * 2654435761 % (1 << 32)
    for _ in range(dim):
        state = (1103515245 * state + 12345) % (1 << 31)
        out.append((state / float(1 << 31)) * 2.0 - 1.0)
    return out


def lsh_signatures(
    df: DataFrame,
    *,
    dim: int,
    n_planes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane (sign) LSH signature as one integer per vector."""
    v = F.col(vec_col).cast("array<double>")
    bits = []
    for p in range(n_planes):
        plane = F.array(*[F.lit(w) for w in _hyperplane(dim, p)])
        dot = F.expr(
            f"aggregate(zip_with(cast({vec_col} as array<double>), "
            f"array({', '.join(repr(w) + 'D' for w in _hyperplane(dim, p))}), "
            "(x, y) -> x * y), 0D, (acc, v) -> acc + v)"
        )
        bits.append(F.when(dot > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0)))
        _ = plane, v
    return df.select(
        F.col(id_col).alias("id"), sum(bits).alias("sig")
    )


def lsh_topk(
    queries_df: DataFrame,
    corpus_df: DataFrame,
    *,
    dim: int,
    k: int = 5,
    n_planes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: equal-signature bucket join, exact re-rank inside.

    The scale path: corpus signatures are computed once (narrow, no
    shuffle), the join key is a 16-bit bucket → candidate set is ~n/2¹⁶
    of the corpus per query, then the exact cosine re-rank runs only on
    candidates. Recall is tunable via n_planes (fewer planes → bigger
    buckets → higher recall, more compute).
    """
    qs = lsh_signatures(queries_df, dim=dim, n_planes=n_planes, id_col=id_col, vec_col=vec_col)
    cs = lsh_signatures(corpus_df, dim=dim, n_planes=n_planes, id_col=id_col, vec_col=vec_col)
    q = (
        queries_df.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("q_vec")
        )
        .join(qs.withColumnRenamed("id", "query_id"), "query_id")
        .withColumnRenamed("sig", "q_sig")
    )
    q = _with_norm(q, "q_vec", "q_norm")
    c = (
        corpus_df.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).cast("array<double>").alias("c_vec"),
        )
        .join(cs.withColumnRenamed("id", "neighbor_id"), "neighbor_id")
        .withColumnRenamed("sig", "c_sig")
    )
    c = _with_norm(c, "c_vec", "c_norm")
    pairs = (
        F.broadcast(q)
        .join(c, F.col("q_sig") == F.col("c_sig"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", _cosine_expr("q_vec", "c_vec", "q_norm", "c_norm"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
