"""JDBC sink/source round-trip (reference operator S11).

The reference claims a PostgreSQL load it never implemented
(reference: README.md:19); the engine provides the stock Spark JDBC
writer/reader. No Postgres exists in this sandbox, but Spark ships the
embedded Derby driver (it backs the Hive metastore), so the round-trip
is tested for real against an in-memory Derby database — same code
path, different URL/driver string in production.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from loan_etl_data_pipeline_spark.sources.jdbc import read_jdbc, write_jdbc

DERBY_URL = "jdbc:derby:memory:loantest;create=true"
DERBY_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


@pytest.fixture(scope="module")
def loans(spark):
    rows = [(i, f"type_{i % 3}", 100.0 * i) for i in range(1, 21)]
    return spark.createDataFrame(rows, "loan_id long, loan_type string, amount double")


def test_jdbc_round_trip(spark, loans):
    write_jdbc(loans, DERBY_URL, "loans", driver=DERBY_DRIVER, mode="overwrite")
    back = read_jdbc(spark, DERBY_URL, "loans", driver=DERBY_DRIVER)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, loans.collect()))


def test_jdbc_partitioned_read(spark, loans):
    write_jdbc(loans, DERBY_URL, "loans_p", driver=DERBY_DRIVER, mode="overwrite")
    back = read_jdbc(
        spark,
        DERBY_URL,
        "loans_p",
        driver=DERBY_DRIVER,
        partition_column="loan_id",
        lower_bound=1,
        upper_bound=21,
        num_partitions=4,
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 20
    agg = back.groupBy("loan_type").agg(F.count(F.lit(1)).alias("n")).collect()
    assert {r["loan_type"]: r["n"] for r in agg} == {
        "type_0": 6, "type_1": 7, "type_2": 7,
    }


def test_jdbc_append_mode(spark, loans):
    write_jdbc(loans, DERBY_URL, "loans_a", driver=DERBY_DRIVER, mode="overwrite")
    write_jdbc(
        loans.filter(F.col("loan_id") <= 5),
        DERBY_URL,
        "loans_a",
        driver=DERBY_DRIVER,
        mode="append",
        num_partitions=1,
    )
    assert read_jdbc(spark, DERBY_URL, "loans_a", driver=DERBY_DRIVER).count() == 25
