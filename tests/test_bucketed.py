"""Bucketed tables (sources/bucketed.py): the no-shuffle co-located join.

These are plan-SHAPE tests: the point of bucketing is which physical
plan Catalyst picks, not the (trivially equal) results — so we assert
on Exchange nodes directly, the same way tests/test_plans.py does for
broadcast joins.
"""

from __future__ import annotations

import pytest

from loan_etl_data_pipeline_spark.sources.bucketed import read_bucketed, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    a = spark.range(0, 10_000).selectExpr("id AS k", "id * 2 AS va")
    b = spark.range(0, 10_000).selectExpr("id AS k", "id * 3 AS vb")
    write_bucketed(a, "t_bucket_a", keys="k", buckets=4, sort_by="k", path=str(base / "a"))
    write_bucketed(b, "t_bucket_b", keys="k", buckets=4, sort_by="k", path=str(base / "b"))
    yield "t_bucket_a", "t_bucket_b"
    spark.sql("DROP TABLE IF EXISTS t_bucket_a")
    spark.sql("DROP TABLE IF EXISTS t_bucket_b")


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_cobucketed_join_has_no_exchange(spark, bucketed_tables):
    ta, tb = bucketed_tables
    # keep the planner honest: force the non-broadcast path so the test
    # proves bucketing (not a broadcast) removed the exchanges
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = read_bucketed(spark, ta).join(read_bucketed(spark, tb), "k")
        plan = _plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"co-bucketed join should not shuffle:\n{plan}"
        assert j.count() == 10_000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_agg_has_no_exchange(spark, bucketed_tables):
    ta, _ = bucketed_tables
    agg = read_bucketed(spark, ta).groupBy("k").count()
    plan = _plan(agg)
    assert "Exchange" not in plan, f"agg on the bucket key should not shuffle:\n{plan}"


def test_unbucketed_join_does_exchange(spark, bucketed_tables):
    """Control: the same join without bucketing shows the shuffles the
    bucketed plan avoided."""
    ta, _ = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain = spark.range(0, 10_000).selectExpr("id AS k", "id * 3 AS vb")
        j = read_bucketed(spark, ta).join(plain, "k")
        assert "Exchange" in _plan(j)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
