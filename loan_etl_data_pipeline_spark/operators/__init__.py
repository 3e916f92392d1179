from loan_etl_data_pipeline_spark.operators.cleaning import (
    TS_FORMATS,
    column_modes,
    column_modes_per_column,
    fill_nulls_with_mode,
    fill_nulls_with_mode_faithful,
    parse_timestamp_multi,
    split_timestamp,
)
from loan_etl_data_pipeline_spark.operators.profile import generate_insights, write_insights_json

__all__ = [
    "TS_FORMATS",
    "column_modes",
    "column_modes_per_column",
    "fill_nulls_with_mode",
    "fill_nulls_with_mode_faithful",
    "parse_timestamp_multi",
    "split_timestamp",
    "generate_insights",
    "write_insights_json",
]
