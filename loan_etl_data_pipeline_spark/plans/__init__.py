from loan_etl_data_pipeline_spark.plans.etl import run_etl

__all__ = ["run_etl"]
