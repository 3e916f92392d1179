"""Loaders for the driver testdata star schema.

``/root/testdata/sf*/`` holds parquet tables
``region nation customer supplier part orders lineitem events documents
embeddings`` (TESTDATA.md). All are plain parquet except ``events``,
whose ``ts`` column is parquet TIMESTAMP(NANOS) — a type Spark does not
support natively. With ``spark.sql.legacy.parquet.nanosAsLong=true`` it
surfaces as a long nanosecond count, which we floor-divide to
microseconds and expose as ``timestamp_ntz`` (matching what DuckDB does
when it truncates nanos to its microsecond timestamps, so oracle
comparisons agree bit-for-bit).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table; normalizes ``events.ts`` to timestamp_ntz.

    The driver has shipped ``events.ts`` as parquet TIMESTAMP(NANOS) in
    some rounds (unsupported by Spark → surfaced as a nanosecond long
    under ``nanosAsLong``) and plain TIMESTAMP(MICROS) in others, so the
    normalization dispatches on the type that actually arrives instead
    of assuming one encoding.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # These confs are dynamic; set them here so the function also works
        # on a driver-created session that didn't go through create_session.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # ts arrives as LTZ from timestamp_micros(); the LTZ→NTZ cast uses
        # the session tz, so pin UTC for a tz-independent naive timestamp.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":  # TIMESTAMP(NANOS) via nanosAsLong
            return df.withColumn(
                "ts",
                F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"),
            )
        return df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    return spark.read.parquet(path)
