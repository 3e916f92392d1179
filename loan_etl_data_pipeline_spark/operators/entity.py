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
