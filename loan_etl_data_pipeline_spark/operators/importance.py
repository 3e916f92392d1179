"""Importance resampling for training-data selection (EXT — SURVEY.md
§2 Part B).

DSIR (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling") selects raw-pool documents whose hashed n-gram
feature distribution looks like a small TARGET corpus: estimate
per-feature-bucket probabilities on both sides, score every raw doc by
its importance weight under the bucket model, keep the top of the
ranking. It is the standard cheap quality/domain filter between crawl
ingestion and training — exactly the operator a 100 TB curation
pipeline runs after dedup and before mixing.

Engine-exact variant implemented here (the repo's deterministic-math
stance, same reasoning as int64 PageRank):

- feature bucket = first ``bucket_hex`` hex chars of md5(bigram) —
  16^bucket_hex buckets, string-keyed, replayable on any engine (the
  hash_split/split_bucket_hex md5 contract; xxhash64 would be
  Spark-only)
- bucket weight  = floor(scale · (t_b + 1) / (r_b + 1))  — add-one
  smoothed target/raw count ratio as ONE exact int64 division. DSIR
  proper scores with Σ log-ratios; libm ``log`` is not bit-reproducible
  across engines, so the SUM of per-bucket log-weights cannot be
  oracle-checked exactly. The rational weight keeps the per-bucket
  ordering (x ↦ log x monotone) and the additive scoring shape, and
  makes the whole selection value-exact cross-engine; the trade is
  that heavy buckets influence the sum linearly instead of
  logarithmically — acceptable for a ranking filter, and documented.
- doc score = Σ weights over the doc's bigram OCCURRENCES (hashed
  count features with multiplicity, as DSIR uses), int64 throughout.

Scale shape: the raw corpus is scanned once into bigram postings; the
per-bucket count tables are ≤ 16^bucket_hex rows (4096 at the default)
so the weight table BROADCASTS onto the postings — no wide join keyed
on anything bigger than the doc id, and the final top-N is a
TakeOrderedAndProject, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F

from loan_etl_data_pipeline_spark.operators.text import tokens


def _bigram_buckets(text_col: str, bucket_hex: int) -> Column:
    """array<string> of md5-prefix bucket keys, one per bigram
    occurrence. Let-binding HOF: referencing the token split inside the
    inner lambda would inline and re-tokenize per bigram — O(L²)
    (same fix as prefix_jaccard/winnow)."""

    def _grams(tb):
        return F.when(
            F.size(tb) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(tb) - 1),
                lambda i: F.substring(
                    F.md5(
                        F.concat(
                            F.element_at(tb, i),
                            F.lit(" "),
                            F.element_at(tb, i + F.lit(1)),
                        )
                    ),
                    1,
                    bucket_hex,
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    base = tokens(F.lower(F.col(text_col)))
    return F.flatten(F.transform(F.array(base), _grams))


def dsir_select(
    raw_df: DataFrame,
    target_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    top_n: int,
    bucket_hex: int = 3,
    scale: int = 10**6,
) -> DataFrame:
    """Top ``top_n`` raw documents by exact hashed-bigram importance
    score against ``target_df`` (see module docstring for the math and
    the documented deviation from log-ratio DSIR).

    Only documents with at least one bigram are eligible (a <2-token
    doc has no features — it cannot be scored, and a selection filter
    keeping featureless docs by default would defeat the point).
    Output: (id, score, rank) — rank 1-based by (score DESC, id ASC),
    deterministic under ties.
    """
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    if not 1 <= bucket_hex <= 8:
        raise ValueError(f"bucket_hex must be in [1, 8], got {bucket_hex}")

    raw_posts = raw_df.select(
        F.col(id_col).alias("id"),
        F.explode(_bigram_buckets(text_col, bucket_hex)).alias("b"),
    )
    raw_counts = raw_posts.groupBy("b").agg(
        F.count(F.lit(1)).cast("bigint").alias("r_cnt")
    )
    tgt_counts = (
        target_df.select(
            F.explode(_bigram_buckets(text_col, bucket_hex)).alias("b")
        )
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t_cnt"))
    )
    weights = (
        raw_counts.join(tgt_counts, "b", "left")
        .select(
            "b",
            F.expr(
                f"({scale}L * (coalesce(t_cnt, 0L) + 1L)) div (r_cnt + 1L)"
            ).alias("w"),
        )
    )
    scored = (
        raw_posts.join(F.broadcast(weights), "b")
        .groupBy("id")
        .agg(F.sum("w").cast("bigint").alias("score"))
    )
    top = scored.orderBy(F.desc("score"), F.asc("id")).limit(top_n)
    # rank over ≤ top_n rows: the single-partition window is fine HERE
    # (the global sort above it is a TakeOrderedAndProject, never a
    # full-corpus Exchange SinglePartition)
    w = Window.orderBy(F.desc("score"), F.asc("id"))
    return top.select(
        F.col("id").alias(id_col),
        "score",
        F.row_number().over(w).cast("bigint").alias("rank"),
    )
