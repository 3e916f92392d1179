"""JDBC (PostgreSQL) sink — reference operator S11.

The reference's README claims "Load final datasets into PostgreSQL"
(reference: README.md:19) but no such write exists in its code (Postgres
only backs Airflow metadata). We close that gap with the stock Spark
JDBC writer. Each task writes its own partition over its own connection,
so throughput scales with executors — cap parallelism with
``numPartitions`` so you don't open 10 000 connections at cluster scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


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
