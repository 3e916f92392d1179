"""JDBC (PostgreSQL) sink — reference operator S11.

The reference's README claims "Load final datasets into PostgreSQL"
(reference: README.md:19) but no such write exists in its code (Postgres
only backs Airflow metadata). We close that gap with the stock Spark
JDBC writer. Each task writes its own partition over its own connection,
so throughput scales with executors — cap parallelism with
``numPartitions`` so you don't open 10 000 connections at cluster scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    user: str | None = None,
    password: str | None = None,
    driver: str = "org.postgresql.Driver",
    partition_column: str | None = None,
    lower_bound=None,
    upper_bound=None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Read a JDBC table (the reverse of :func:`write_jdbc`).

    Without partitioning options the whole table arrives through ONE
    connection on one task — fine for dimension tables, a bottleneck for
    facts. Pass ``partition_column``/bounds/``num_partitions`` to split
    the scan into range predicates executed in parallel, the standard
    Spark JDBC scale path.
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
    )
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 4))
        )
    if user is not None:
        reader = reader.option("user", user)
    if password is not None:
        reader = reader.option("password", password)
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    *,
    user: str | None = None,
    password: str | None = None,
    mode: str = "append",
    num_partitions: int | None = None,
    batch_size: int = 10_000,
    driver: str = "org.postgresql.Driver",
) -> None:
    """Write ``df`` to a JDBC table (e.g. ``jdbc:postgresql://host/db``)."""
    if num_partitions is not None:
        df = df.coalesce(num_partitions)
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
        .option("batchsize", str(batch_size))
        .mode(mode)
    )
    if user is not None:
        writer = writer.option("user", user)
    if password is not None:
        writer = writer.option("password", password)
    writer.save()
