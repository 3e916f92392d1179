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
