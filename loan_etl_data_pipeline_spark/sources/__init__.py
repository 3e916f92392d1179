from loan_etl_data_pipeline_spark.sources.csv import read_csv, discover_input_files
from loan_etl_data_pipeline_spark.sources.tables import load_table, TABLES

__all__ = ["read_csv", "discover_input_files", "load_table", "TABLES"]
