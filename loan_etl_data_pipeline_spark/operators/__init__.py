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

from loan_etl_data_pipeline_spark.operators.joins import asof_join, range_join
from loan_etl_data_pipeline_spark.operators.skew import salted_join
from loan_etl_data_pipeline_spark.operators.graph import connected_components
from loan_etl_data_pipeline_spark.operators.packing import pack_documents

__all__ += ["asof_join", "range_join", "salted_join", "connected_components", "pack_documents"]

from loan_etl_data_pipeline_spark.operators.dedup import ngram_decontaminate
from loan_etl_data_pipeline_spark.operators.text import (
    chunk_documents,
    redact_pii,
    repetition_stats,
)

__all__ += ["ngram_decontaminate", "chunk_documents", "redact_pii", "repetition_stats"]

from loan_etl_data_pipeline_spark.operators.quantize import quantize_embeddings, quantized_topk

__all__ += ["quantize_embeddings", "quantized_topk"]

from loan_etl_data_pipeline_spark.operators import quality
from loan_etl_data_pipeline_spark.operators.windows import resample_timeseries

__all__ += ["quality", "resample_timeseries"]

from loan_etl_data_pipeline_spark.operators.diff import table_diff

__all__ += ["table_diff"]

from loan_etl_data_pipeline_spark.operators.scd import (
    point_in_time_join,
    scd2_from_history,
    scd2_merge,
)

__all__ += ["point_in_time_join", "scd2_from_history", "scd2_merge"]

from loan_etl_data_pipeline_spark.operators.retrieval import (
    bm25_topk,
    bm25_topk_indexed,
    build_text_index,
    tfidf_top_terms,
    update_text_index,
)
from loan_etl_data_pipeline_spark.operators.dedup import ngram_containment_pairs
from loan_etl_data_pipeline_spark.operators.joins import fuzzy_blocked_join

__all__ += [
    "bm25_topk",
    "bm25_topk_indexed",
    "build_text_index",
    "tfidf_top_terms",
    "update_text_index",
    "ngram_containment_pairs",
    "fuzzy_blocked_join",
]

from loan_etl_data_pipeline_spark.operators.windows import funnel_counts
from loan_etl_data_pipeline_spark.operators.quality import iqr_outliers

__all__ += ["funnel_counts", "iqr_outliers"]

from loan_etl_data_pipeline_spark.operators.ivf import (
    build_ivf_index,
    ivf_topk,
    ivf_topk_indexed,
    load_ivf_centroids,
    train_ivf_centroids,
)

__all__ += [
    "build_ivf_index",
    "ivf_topk",
    "ivf_topk_indexed",
    "load_ivf_centroids",
    "train_ivf_centroids",
]
