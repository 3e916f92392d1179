"""Salted join (operators/skew.py): equivalence with the plain join and
actual hotspot sharding."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from loan_etl_data_pipeline_spark.operators.skew import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 10k rows, 90% on one hot key — the shape AQE sees as one giant partition
    big = spark.range(0, 10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(F.lit("cold")).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.createDataFrame(
        [("hot", 1.0), ("cold", 2.0), ("absent", 3.0)], "k string, w double"
    )
    return big, small


def _sorted_rows(df):
    return sorted(map(tuple, df.collect()))


def test_inner_matches_plain_join(skewed):
    big, small = skewed
    plain = big.join(small, "k")
    salted = salted_join(big, small, "k", salt=8)
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_left_matches_plain_join(spark, skewed):
    big, small = skewed
    plain = big.join(small, "k", "left")
    salted = salted_join(big, small, "k", salt=8, how="left")
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_hot_key_is_sharded_even_for_duplicate_rows(skewed):
    """The worst case is fully identical rows (fact.select(key)): a pure
    row-hash salt would put them ALL in one shard — the ordinal in the
    salt is what spreads them."""
    big, _ = skewed
    dup_rows = big.select("k")  # every 'hot' row now byte-identical
    salt_expr = F.pmod(
        F.xxhash64(*[F.col(c) for c in dup_rows.columns], F.monotonically_increasing_id()),
        F.lit(8),
    )
    per_shard = (
        dup_rows.withColumn("__salt", salt_expr)
        .filter(F.col("k") == "hot")
        .groupBy("__salt")
        .count()
        .collect()
    )
    assert len(per_shard) == 8  # hot key actually spread over all shards
    counts = [r["count"] for r in per_shard]
    assert max(counts) < 9_000 * 0.3  # no shard holds the old hotspot


def test_duplicate_row_join_still_correct(spark, skewed):
    _, small = skewed
    dup_big = spark.createDataFrame([("hot",)] * 500 + [("cold",)] * 5, "k string")
    plain = dup_big.join(small, "k")
    salted = salted_join(dup_big, small, "k", salt=8)
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_unsupported_how_raises(skewed):
    big, small = skewed
    with pytest.raises(ValueError, match="salted_join"):
        salted_join(big, small, "k", how="full")


def test_skew_report_hand_checked(spark):
    from loan_etl_data_pipeline_spark.operators.skew import skew_report

    # key a: 6 rows, b: 2, c: 2  -> n_keys=3, n_rows=10, max=6, avg=10/3
    rows = [("a",)] * 6 + [("b",)] * 2 + [("c",)] * 2
    df = spark.createDataFrame(rows, "k string")
    r = skew_report(df, "k").collect()[0]
    assert r["n_keys"] == 3 and r["n_rows"] == 10 and r["max_cnt"] == 6
    assert r["avg_cnt"] == 10.0 / 3.0
    assert r["p50_cnt"] == 2.0  # counts [2,2,6] median
    assert r["skew_ratio"] == 6.0 / (10.0 / 3.0)
