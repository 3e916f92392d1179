"""hash_split (functions/splits.py): determinism, fraction, salt.

Cross-engine assignment equality is q_hash_split vs the DuckDB oracle
(tests/test_oracle_parity.py)."""

from __future__ import annotations

import pytest

from loan_etl_data_pipeline_spark.functions.splits import hash_split


def _assignments(df, **kw):
    return {r["doc_id"]: r["split"] for r in hash_split(df, "doc_id", **kw).collect()}


def test_fraction_and_partitioning_invariance(spark):
    df = spark.range(0, 5000).selectExpr("id AS doc_id")
    a = _assignments(df, train_frac=0.8, salt="s")
    b = _assignments(df.repartition(13), train_frac=0.8, salt="s")
    assert a == b, "assignment must not depend on partitioning"
    frac = sum(v == "train" for v in a.values()) / len(a)
    assert abs(frac - 0.8) < 0.02


def test_assignment_is_stable_under_data_growth(spark):
    """New rows never move old rows between splits (the randomSplit bug)."""
    small = spark.range(0, 1000).selectExpr("id AS doc_id")
    big = spark.range(0, 5000).selectExpr("id AS doc_id")
    a_small = _assignments(small, salt="s")
    a_big = _assignments(big, salt="s")
    assert all(a_big[k] == v for k, v in a_small.items())


def test_salt_rerolls(spark):
    df = spark.range(0, 2000).selectExpr("id AS doc_id")
    a = _assignments(df, salt="exp1")
    b = _assignments(df, salt="exp2")
    assert a != b
    with pytest.raises(ValueError, match="train_frac"):
        hash_split(df, "doc_id", train_frac=1.5)


def test_extreme_fractions_stay_valid(spark):
    """frac→1 must approach all-train (the unclamped threshold '10000'
    used to INVERT to all-test via 5-char string compare), frac→0 all-test."""
    df = spark.range(0, 2000).selectExpr("id AS doc_id")
    hi = _assignments(df, train_frac=0.99999)
    lo = _assignments(df, train_frac=0.00001)
    assert sum(v == "train" for v in hi.values()) / len(hi) > 0.99
    assert sum(v == "train" for v in lo.values()) < 5


def test_stratified_sample(spark):
    from loan_etl_data_pipeline_spark.functions.splits import stratified_sample

    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(4000)] + [(9999, "c")],
        "doc_id long, s string",
    )
    out = stratified_sample(df, "doc_id", "s", {"a": 0.5, "b": 1.0}, salt="x")
    rows = out.collect()
    by_s = {}
    for r in rows:
        by_s.setdefault(r["s"], []).append(r["doc_id"])
    assert "c" not in by_s  # unlisted stratum dropped
    assert len(by_s["b"]) == 2000  # frac 1.0 keeps everything
    assert abs(len(by_s["a"]) / 2000 - 0.5) < 0.05
    # deterministic under repartitioning
    again = stratified_sample(
        df.repartition(7), "doc_id", "s", {"a": 0.5, "b": 1.0}, salt="x"
    ).collect()
    assert sorted((r["doc_id"]) for r in again) == sorted(r["doc_id"] for r in rows)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="at least one stratum"):
        stratified_sample(df, "doc_id", "s", {"a": 0.0})
