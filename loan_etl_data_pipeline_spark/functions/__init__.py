"""Public expression helpers (deterministic cross-engine arithmetic + sketches)."""

from loan_etl_data_pipeline_spark.functions.deterministic import (
    davg,
    davg_sql,
    dsum,
    dsum_sql,
)
from loan_etl_data_pipeline_spark.functions.sketches import (
    distinct_sketches,
    estimate,
    merge_sketches,
)
from loan_etl_data_pipeline_spark.functions.splits import (
    expand_mixture,
    hash_split,
    sample_per_key,
    split_bucket_hex,
    stratified_sample,
    weighted_sample,
    curriculum_tiles,
    negative_samples,
)

__all__ = [
    "dsum", "dsum_sql", "davg", "davg_sql",
    "distinct_sketches", "merge_sketches", "estimate",
    "hash_split", "split_bucket_hex", "stratified_sample",
    "sample_per_key", "expand_mixture", "weighted_sample",
    "curriculum_tiles", "negative_samples",
]
