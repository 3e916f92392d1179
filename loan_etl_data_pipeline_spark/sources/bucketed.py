"""Bucketed parquet tables: pre-shuffled storage for co-located joins.

The reference writes plain parquet (reference: airflow/dags/etl/
pyspark_etl.py:56), which is right for write-once outputs. But the
tables a pipeline joins or aggregates *repeatedly* on the same key —
fact tables against each other, events against user state — pay a full
shuffle of the big side on every query. Bucketing moves that shuffle to
write time: ``bucketBy(n, keys)`` hash-partitions rows into a fixed
number of files per partition, and Catalyst then plans joins and
aggregations between co-bucketed tables with NO Exchange — the scan's
output partitioning already satisfies the join's distribution
requirement (verified by the plan-shape test in tests/test_bucketed.py).

At 100 TB this is the difference between "every query re-shuffles 100 TB"
and "one shuffle at ingest, zero after". Sizing: pick ``buckets`` so a
bucket is a few hundred MB at the target scale (buckets = table_bytes /
256 MB is a sane start); both sides of a join must use the same bucket
count (or an integer multiple, with ``spark.sql.bucketing.
coalesceBucketsInJoin.enabled``).

Bucketed tables must go through the session catalog (``saveAsTable``) —
plain ``.parquet(path)`` writes ignore bucket metadata. Pass ``path`` to
keep the data external at a location you control.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    keys: list[str] | str,
    buckets: int,
    sort_by: list[str] | str | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed parquet table registered as ``table``.

    ``sort_by`` additionally sorts within each bucket file, which lets
    sort-merge joins skip their per-task sort as well (and makes the
    files range-readable for key lookups).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    w = df.write.mode(mode).format("parquet").bucketBy(buckets, *keys)
    if sort_by:
        sort_by = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        w = w.sortBy(*sort_by)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back (catalog lookup keeps bucket metadata)."""
    return spark.table(table)
