"""Entity-resolution building blocks: error-tolerant candidate pairing.

The reference pipeline has no identity handling at all; loan books live
and die by it (one borrower, four spellings). The blocking primitive
here is the FastSS deletion neighborhood (see q_del1_join's docstring
for the completeness argument): an equi-join on (string ∪ one-char
deletions) keys finds every pair within edit distance 1 without a
quadratic levenshtein self-join, then a cheap exact verify prunes
collisions. plans/entity.py composes this with connected components
and a golden-record merge into the full resolve pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def del1_pairs(df: DataFrame, id_col: str, str_col: str) -> DataFrame:
    """(id_a, id_b, dist) for every pair of rows whose ``str_col``
    values are within edit distance 1 (dist 0 = exact duplicates),
    id_a < id_b. Deletion-neighborhood equi-join (key fan-out len+1
    per row) + levenshtein verify on candidates only.
    """
    keys = df.select(
        F.col(id_col).alias("__id"),
        F.col(str_col).alias("__s"),
        F.explode(
            F.array_union(
                F.array(F.col(str_col)),
                F.expr(
                    f"transform(sequence(1, length({str_col})), i -> "
                    f"concat(substring({str_col}, 1, i-1), "
                    f"substring({str_col}, i+1, length({str_col}))))"
                ),
            )
        ).alias("k"),
    )
    a = keys.select(
        F.col("__id").alias("id_a"), F.col("__s").alias("__sa"), "k"
    )
    b = keys.select(
        F.col("__id").alias("id_b"), F.col("__s").alias("__sb"), "k"
    )
    return (
        a.join(b, "k")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "__sa", "__sb")
        .distinct()
        .withColumn(
            "dist", F.levenshtein(F.col("__sa"), F.col("__sb")).cast("bigint")
        )
        .filter(F.col("dist") <= 1)
        .select("id_a", "id_b", "dist")
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    key_col: str,
    *,
    window: int = 6,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández–Stolfo merge/purge):
    records sort by the blocking key, and only pairs within ``window``
    positions of each other become candidates — O(n·w) candidates
    instead of O(n²), the OTHER classic ER blocking scheme next to the
    deletion-neighborhood index (FastSS, plans/entity.py): FastSS
    recalls any ≤k-edit pair regardless of sort distance but fans out
    keys; sorted-neighborhood is one sort + a bounded self-join and
    catches what sorting co-locates (prefix-stable typos).

    Distributed: the total order comes from functions/ranking
    global_rank (range shuffle, never a single-partition window);
    candidates join on EQUALITY of an exploded rank offset (w−1
    fan-out), so there is no range-condition nested loop. Returns
    (id_a, id_b, key_a, key_b) candidate pairs, id_a ranked before
    id_b; dedup of equal keys is the caller's verify step.
    """
    from loan_etl_data_pipeline_spark.functions.ranking import global_rank

    if window < 2:
        # window=1 has no pairs — and Spark's sequence(rank+1, rank)
        # would silently emit a DESCENDING [rank+1, rank] instead of
        # the empty list, fabricating self/backward candidates
        raise ValueError("sorted-neighborhood window must be >= 2")
    ranked = global_rank(
        df.select(F.col(id_col).alias("id"), F.col(key_col).alias("key")),
        [F.asc("key"), F.asc("id")],
    )
    a = ranked.select(
        F.col("id").alias("id_a"),
        F.col("key").alias("key_a"),
        F.explode(
            F.sequence(F.col("rank") + 1, F.col("rank") + (window - 1))
        ).alias("nbr"),
    )
    b = ranked.select(
        F.col("id").alias("id_b"),
        F.col("key").alias("key_b"),
        F.col("rank").alias("nbr"),
    )
    out = a.join(b, "nbr").select("id_a", "id_b", "key_a", "key_b")
    out._persisted_intermediates = getattr(  # noqa: SLF001
        ranked, "_persisted_intermediates", ()
    )
    return out
