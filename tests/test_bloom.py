"""Bloom-filter join pruning: no false negatives ever, bounded false
positives, end-to-end join equality, and a shuffle-free probe plan."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from loan_etl_data_pipeline_spark.functions.bloom import bloom_build, bloom_prune


@pytest.fixture(scope="module")
def build_keys(spark):
    # 1000 even keys 0..1998
    return spark.range(0, 2000, 2).select(F.col("id").alias("k"))


@pytest.fixture(scope="module")
def bloom(build_keys):
    return bloom_build(build_keys, "k", num_bits=1 << 14, num_hashes=5).cache()


def test_no_false_negatives(spark, build_keys, bloom):
    probe = build_keys.select(F.col("k").alias("key"))
    kept = bloom_prune(probe, "key", bloom)
    assert kept.count() == 1000  # every true member survives


def test_false_positive_rate_bounded(spark, bloom):
    # odd keys are all non-members; 2^14 bits / 1000 keys ≈ 16 bits/key,
    # k=5 → theoretical FP ≈ 0.5%; assert a loose 5% ceiling
    non_members = spark.range(1, 20001, 2).select(F.col("id").alias("key"))
    fp = bloom_prune(non_members, "key", bloom).count()
    assert fp / 10000 < 0.05, fp


def test_pruned_join_equals_plain_join(spark, build_keys, bloom):
    probe = spark.range(0, 5000).select(
        F.col("id").alias("key"), (F.col("id") * 10).alias("payload")
    )
    plain = probe.join(build_keys, probe.key == build_keys.k).select("key", "payload")
    pruned = (
        bloom_prune(probe, "key", bloom)
        .join(build_keys, F.col("key") == build_keys.k)
        .select("key", "payload")
    )
    assert sorted(plain.collect()) == sorted(pruned.collect())


def test_null_keys_dropped(spark, bloom):
    probe = spark.range(3).select(
        F.when(F.col("id") == 0, F.lit(None)).otherwise(F.col("id") * 2).alias("key")
    )
    kept = bloom_prune(probe, "key", bloom).collect()
    assert sorted(r.key for r in kept) == [2, 4]


def test_probe_plan_is_shuffle_free(spark, bloom, tmp_path):
    # persist the filter (the cross-query reuse story), so the probe plan
    # stands alone instead of re-inlining the build lineage
    path = str(tmp_path / "bloom")
    bloom.write.parquet(path)
    stored = spark.read.parquet(path)
    probe = spark.range(0, 5000).select(F.col("id").alias("key"))
    plan = (
        bloom_prune(probe, "key", stored)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the prune itself must not repartition the probe side: only the
    # one-row bitmap broadcast joins in
    assert "Exchange hashpartitioning" not in plan
    assert "Broadcast" in plan


def test_bitmap_is_bounded_one_row(bloom):
    rows = bloom.collect()
    assert len(rows) == 1
    assert len(rows[0]["__bloom_bitmap"]) == (1 << 14) // 64


def test_validation():
    import pyspark.sql

    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_build(None, "k", num_bits=100)
    with pytest.raises(ValueError, match="num_hashes"):
        bloom_build(None, "k", num_bits=64, num_hashes=0)


def test_no_false_negatives_across_key_types(spark):
    """xxhash64 is type-sensitive (xxhash64(5::int) != xxhash64(5::bigint));
    the canonical string cast must make an int-keyed build prune a
    bigint-keyed probe correctly — before the fix, 0 of the true
    matches survived."""
    from loan_etl_data_pipeline_spark.functions.bloom import bloom_build, bloom_prune

    dim = spark.createDataFrame([(i,) for i in range(100)], "k int")
    fact = spark.createDataFrame([(i,) for i in range(200)], "k long")
    bloom = bloom_build(dim, "k", num_bits=1 << 12, num_hashes=5)
    kept = {r.k for r in bloom_prune(fact, "k", bloom).collect()}
    assert set(range(100)) <= kept  # every true match survives
