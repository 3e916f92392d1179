"""Public expression helpers (deterministic cross-engine arithmetic)."""

from loan_etl_data_pipeline_spark.functions.deterministic import (
    davg,
    davg_sql,
    dsum,
    dsum_sql,
)

__all__ = ["dsum", "dsum_sql", "davg", "davg_sql"]
