"""merge_upsert (plans/upsert.py): key-level merge, partition-scoped
rewrite, untouched partitions byte-stable."""

from __future__ import annotations

import os

from loan_etl_data_pipeline_spark.plans.upsert import merge_upsert


def _files(d):
    return {
        f: os.path.getmtime(os.path.join(d, f))
        for f in os.listdir(d)
        if f.endswith(".parquet")
    }


def test_merge_upsert(spark, tmp_path):
    table = str(tmp_path / "state")
    spark.createDataFrame(
        [(1, "2024-01-01", 10.0), (2, "2024-01-01", 20.0), (3, "2024-01-02", 30.0)],
        "k long, day string, v double",
    ).write.partitionBy("day").parquet(table)
    day2_before = _files(os.path.join(table, "day=2024-01-02"))

    updates = spark.createDataFrame(
        [(2, "2024-01-01", 99.0), (7, "2024-01-01", 70.0)],
        "k long, day string, v double",
    )
    merge_upsert(spark, table, updates, key_cols="k", partition_col="day")

    rows = {r["k"]: r for r in spark.read.parquet(table).collect()}
    assert sorted(rows) == [1, 2, 3, 7]
    assert rows[2]["v"] == 99.0  # updated
    assert rows[1]["v"] == 10.0  # untouched key in touched partition survives
    assert rows[7]["v"] == 70.0  # inserted
    assert rows[3]["v"] == 30.0  # untouched partition
    assert _files(os.path.join(table, "day=2024-01-02")) == day2_before
    # conf restored
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC").upper()
        == "STATIC"
    )


def test_upsert_twice_is_idempotent(spark, tmp_path):
    table = str(tmp_path / "state2")
    spark.createDataFrame(
        [(1, "2024-01-01", 1.0)], "k long, day string, v double"
    ).write.partitionBy("day").parquet(table)
    updates = spark.createDataFrame(
        [(1, "2024-01-01", 2.0)], "k long, day string, v double"
    )
    merge_upsert(spark, table, updates, key_cols="k", partition_col="day")
    merge_upsert(spark, table, updates, key_cols="k", partition_col="day")
    rows = spark.read.parquet(table).collect()
    assert len(rows) == 1 and rows[0]["v"] == 2.0


def test_duplicate_update_keys_rejected(spark, tmp_path):
    import pytest

    table = str(tmp_path / "state3")
    spark.createDataFrame(
        [(1, "2024-01-01", 1.0)], "k long, day string, v double"
    ).write.partitionBy("day").parquet(table)
    dup_updates = spark.createDataFrame(
        [(1, "2024-01-01", 2.0), (1, "2024-01-01", 3.0)],
        "k long, day string, v double",
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        merge_upsert(spark, table, dup_updates, key_cols="k", partition_col="day")
