"""Insights / profiling layer (reference operators G1-G6 + S3).

Reproduces ``generate_insights``
(reference: airflow/dags/etl/pyspark_etl.py:35-46): a dict with
``total_loans`` (global count), ``avg_loan_amount`` (null-ignoring mean,
present only when the column exists) and ``by_loan_type`` (unordered
records of {loan_type, count}, present only when the column exists) —
the conditional probes are part of the contract (the golden
insights.json came from a run where both columns were absent,
reference: etl/insights/insights.json:1-3).

Scale difference vs the reference: the reference fires three separate
uncached jobs (count, mean+collect, groupBy+toPandas —
reference: airflow/dags/etl/pyspark_etl.py:38,41,44). Here the scalar
aggregates are ONE job (single ``agg`` over the frame), the group-by is
a second, and callers are expected to pass an already-cached frame (see
plans/etl.py) so nothing re-reads the source.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def generate_insights(
    df: DataFrame,
    *,
    amount_col: str = "loan_amount",
    type_col: str = "loan_type",
) -> dict:
    """Compute the insights dict for ``df`` in at most two jobs."""
    aggs = [F.count(F.lit(1)).alias("total")]
    has_amount = amount_col in df.columns
    if has_amount:
        aggs.append(F.avg(F.col(amount_col)).alias("avg_amount"))
    row = df.agg(*aggs).collect()[0]

    insights: dict = {"total_loans": row["total"]}
    if has_amount:
        insights["avg_loan_amount"] = row["avg_amount"]
    if type_col in df.columns:
        insights["by_loan_type"] = [
            r.asDict()
            for r in df.groupBy(type_col).agg(F.count(F.lit(1)).alias("count")).collect()
        ]
    return insights


def write_insights_json(insights: dict, path: str) -> str:
    """Persist the insights dict as pretty JSON (reference S3,
    reference: airflow/dags/etl/pyspark_etl.py:59-62)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(insights, f, indent=2, default=str)
    return path
