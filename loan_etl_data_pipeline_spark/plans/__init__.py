from loan_etl_data_pipeline_spark.plans.etl import run_etl, run_etl_incremental
from loan_etl_data_pipeline_spark.plans.corpus import prepare_corpus, remove_near_duplicates
from loan_etl_data_pipeline_spark.plans.upsert import merge_upsert

__all__ = ["run_etl", "run_etl_incremental", "prepare_corpus", "remove_near_duplicates", "merge_upsert"]
