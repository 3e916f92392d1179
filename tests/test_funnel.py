"""Ordered-funnel semantics (operators/windows.py funnel_counts):
strict sequencing, non-monotone arrival, plan shape."""

from __future__ import annotations

import datetime as dt

import pytest

from loan_etl_data_pipeline_spark.operators.windows import funnel_counts


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # u1 completes the funnel in order
        ("u1", _ts(1), "view"), ("u1", _ts(2), "click"), ("u1", _ts(3), "purchase"),
        # u2 clicks BEFORE viewing -> click doesn't count; re-click later does
        ("u2", _ts(1), "click"), ("u2", _ts(2), "view"), ("u2", _ts(3), "click"),
        # u3 views only
        ("u3", _ts(1), "view"),
        # u4 purchase without click -> stops at view
        ("u4", _ts(1), "view"), ("u4", _ts(2), "purchase"),
        # u5 same-timestamp click (not strictly after) -> stops at view
        ("u5", _ts(1), "view"), ("u5", _ts(1), "click"),
    ]
    return spark.createDataFrame(rows, "user_id string, ts timestamp, event_type string")


def test_strict_ordered_funnel(events):
    out = {
        r["stage"]: (r["stage_idx"], r["users"])
        for r in funnel_counts(events, ["view", "click", "purchase"]).collect()
    }
    assert out["view"] == (0, 5)
    assert out["click"] == (1, 2)   # u1 and u2 (second click)
    assert out["purchase"] == (2, 1)  # u1 only


def test_single_stage_and_validation(events):
    out = funnel_counts(events, ["purchase"]).collect()
    assert out[0]["users"] == 2  # u1, u4
    with pytest.raises(ValueError):
        funnel_counts(events, [])


def test_one_exchange_plan(events):
    plan = (
        funnel_counts(events, ["view", "click", "purchase"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # chained windows + per-user agg reuse ONE user-keyed Exchange; the
    # only other exchange is the final single-row global aggregate
    assert plan.count("Exchange hashpartitioning") <= 1


def test_time_weighted_avg_hand_computed(spark):
    """Planted gaps: value 10 held 2s, value 30 held 1s → twa 50/3;
    the final reading drops (open-ended interval)."""
    import pyspark.sql.functions as F
    from loan_etl_data_pipeline_spark.queries import q_time_weighted_avg

    # route through the query's own window logic via a temp parquet dir
    import os, tempfile
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [
                (1, "2024-01-01 00:00:00", 7, "c", 10.0, "{}"),
                (2, "2024-01-01 00:00:02", 7, "c", 30.0, "{}"),
                (3, "2024-01-01 00:00:03", 7, "c", 99.0, "{}"),
                (4, "2024-01-01 00:00:05", 8, "c", 5.0, "{}"),
            ],
            "event_id long, ts string, user_id long, event_type string,"
            " value double, props string",
        ).withColumn("ts", F.col("ts").cast("timestamp_ntz")).write.parquet(
            os.path.join(d, "events.parquet")
        )
        rows = {r["user_id"]: r for r in q_time_weighted_avg(spark, d).collect()}
    assert 8 not in rows  # single reading → no closed interval
    r = rows[7]
    assert r["n_intervals"] == 2
    assert r["total_us"] == 3_000_000
    # floor(10*2e6) + floor(30*1e6) = 50e6 over 3e6 µs
    assert r["twa"] == 50_000_000 / 3_000_000


def test_price_trend_hand_computed(spark):
    """Perfect line y = 200 + 100·x cents over three days → slope
    exactly 1.00 dollars/day, intercept 2.00, per group."""
    import os, tempfile
    import pyspark.sql.functions as F
    from loan_etl_data_pipeline_spark.queries import q_price_trend

    with tempfile.TemporaryDirectory() as d:
        rows = [
            (i, 1, "O", 2.0 + 1.0 * day, f"1970-01-0{day+1} 00:00:00", "1-URGENT")
            for i, day in enumerate([0, 1, 2])
        ]
        spark.createDataFrame(
            rows,
            "o_orderkey long, o_custkey long, o_orderstatus string,"
            " o_totalprice double, o_orderdate string, o_orderpriority string",
        ).withColumn(
            "o_orderdate", F.col("o_orderdate").cast("timestamp_ntz")
        ).write.parquet(os.path.join(d, "orders.parquet"))
        r = q_price_trend(spark, d).collect()
    assert len(r) == 1
    assert r[0]["n"] == 3
    assert r[0]["slope_per_day"] == 1.0
    assert r[0]["intercept"] == 2.0
