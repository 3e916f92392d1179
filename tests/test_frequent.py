"""Heavy hitters: exact equality with the plain GROUP BY answer, even
with a deliberately tiny MG capacity and hostile partitioning."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from loan_etl_data_pipeline_spark.operators.frequent import heavy_hitters


def _exact(df, col, thr):
    total = df.filter(F.col(col).isNotNull()).count()
    rows = (
        df.filter(F.col(col).isNotNull())
        .groupBy(col)
        .count()
        .filter(F.col("count") >= thr * total)
        .collect()
    )
    return {(r[col], r["count"]) for r in rows}


def _zipfish(spark, n_parts):
    # value i appears ~1000/i times: a few heavy values, long tail
    rows = [(f"v{i}",) for i in range(1, 200) for _ in range(1000 // i)]
    return spark.createDataFrame(rows, "tok string").repartition(n_parts)


@pytest.mark.parametrize("n_parts", [1, 7])
def test_heavy_hitters_equals_exact(spark, n_parts):
    df = _zipfish(spark, n_parts)
    thr = 0.02
    got = {
        (r["tok"], r["freq"]) for r in heavy_hitters(df, "tok", thr).collect()
    }
    assert got == _exact(df, "tok", thr)
    assert len(got) > 0


def test_heavy_hitters_tiny_capacity_still_exact(spark):
    """safety=1 (minimum capacity 1/thr) must still be a superset in
    phase 1, hence exact after verify — the MG guarantee itself."""
    df = _zipfish(spark, 13)
    thr = 0.05
    got = {
        (r["tok"], r["freq"])
        for r in heavy_hitters(df, "tok", thr, safety=1.0).collect()
    }
    assert got == _exact(df, "tok", thr)


def test_heavy_hitters_nulls_ignored_and_empty(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("a",), ("b",)], "tok string"
    )
    got = {(r["tok"], r["freq"]) for r in heavy_hitters(df, "tok", 0.5).collect()}
    assert got == {("a", 2)}  # 2 of 3 non-null rows
    empty = df.filter("tok = 'zzz'")
    assert heavy_hitters(empty, "tok", 0.5).count() == 0
    with pytest.raises(ValueError):
        heavy_hitters(df, "tok", 0.0)
    with pytest.raises(ValueError):
        heavy_hitters(df, "tok", 0.5, safety=0.5)
