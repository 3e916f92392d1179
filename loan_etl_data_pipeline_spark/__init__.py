"""loan_etl_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the capabilities of the
reference repo ``Kritikajoshi20/loan-etl-data-pipeline`` (an Airflow +
PySpark loan-CSV ETL: CSV in → mode-based null fill → timestamp split →
Parquet out → aggregate "insights" JSON), extended with the
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns, event-time windows) that a 100 TB training-data
pipeline needs.

Design stance (see SURVEY.md §4.3):
- Everything is declared via the DataFrame / Spark SQL API so Catalyst
  does pushdown, pruning, join selection, and whole-stage codegen.
- No per-column job storms: the reference's O(columns) mode-fill
  (reference: airflow/dags/etl/pyspark_etl.py:14-21) is replaced by a
  single-shuffle melt plan (operators/cleaning.py), with the faithful
  per-column variant kept for parity testing.
- No ``collect()`` on data-sized results; driver round-trips only for
  scalar mode values and the 1-row insights record.
- Python UDFs only where built-ins genuinely can't express the op, and
  then always Arrow-batched (mapInPandas / pandas_udf).
"""

from loan_etl_data_pipeline_spark.session import create_session
from loan_etl_data_pipeline_spark.sources.tables import load_table, TABLES

__all__ = ["create_session", "load_table", "TABLES"]

__version__ = "0.1.0"
