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


def test_aqe_splits_skewed_join_partition(spark):
    """Runtime (not plan-string) evidence for the skew playbook's
    second lever: with AQE's skew-join handling on, the one giant
    hot-key partition of a sort-merge join is SPLIT at execution time
    (final adaptive plan marks the join skew=true) and results are
    identical to the unsplit join."""
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # thresholds small enough that the test-sized hot partition
        # qualifies as skewed
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        big = spark.range(0, 200_000).selectExpr(
            "CASE WHEN id % 20 < 19 THEN 0 ELSE 1 + id % 96 END AS k",
            "id AS v",
            "sha2(CAST(id AS STRING), 256) AS pad",  # incompressible
        )
        right = spark.range(0, 97).selectExpr("id AS k", "id * 10 AS w")
        # the join must be the RESULT stage: any downstream operator
        # that requires the join's hash partitioning (a groupBy on the
        # join key, even a global agg's exchange in some shapes) makes
        # AQE decline the split — verified while writing this test;
        # forceOptimizeSkewedJoin exists for those cases
        joined = big.join(right, "k")
        rows = joined.collect()
        assert sum(1 for r in rows if r["k"] == 0) == 190_000
        p = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in p
        assert "skew=true" in p, p[:800]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
