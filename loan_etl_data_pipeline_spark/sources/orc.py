"""ORC read/write — the second columnar format next to parquet.

The reference pipeline is parquet-only (`airflow/dags/etl/
pyspark_etl.py:58` writes `df.write.mode("overwrite").parquet(...)`);
a complete engine also speaks ORC, the other splittable columnar
format a lakehouse consumer will hand us (Hive/Trino estates are
full of it). Spark's native ORC datasource gives the same pushdown
machinery as parquet — predicate pushdown into stripe/row-group
indexes, column pruning, vectorized reads — so the operators in this
package run unchanged over either format; the layout helpers
(sources/layout.py write_sorted) apply identically since min/max
stripe statistics serve the same skipping role as parquet row-group
stats.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_orc(
    df: DataFrame,
    path: str,
    *,
    partition_by: Sequence[str] | str | None = None,
    sort_cols: Sequence[str] | str | None = None,
    compression: str = "zstd",
    mode: str = "overwrite",
) -> None:
    """Write ORC, optionally hive-partitioned and/or sorted.

    ``sort_cols`` range-partitions then sorts within files so stripe
    min/max statistics become selective on those columns — the same
    one-extra-shuffle trade as ``layout.write_sorted`` for parquet.
    ``zstd`` is the modern default codec (ORC's own default is still
    snappy for compatibility).
    """
    if sort_cols:
        sort_cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        df = df.repartitionByRange(*sort_cols).sortWithinPartitions(*sort_cols)
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
        writer = writer.partitionBy(*cols)
    writer.orc(path)


def read_orc(
    spark: SparkSession,
    path: str,
    *,
    columns: Sequence[str] | None = None,
    predicate: str | None = None,
) -> DataFrame:
    """Read ORC with explicit pruning hooks.

    ``columns``/``predicate`` are applied directly on the scan so
    column pruning and predicate pushdown reach the ORC reader (the
    plan's ``PushedFilters`` — asserted by the round-trip test).
    Callers composing further transformations can equally pass the
    raw frame on; Catalyst pushes later filters down the same way.
    """
    df = spark.read.orc(path)
    if predicate:
        df = df.filter(predicate)
    if columns:
        df = df.select(*columns)
    return df
