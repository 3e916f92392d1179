"""As-of join (operators/joins.py): semantics, ties, tolerance, determinism.

The sf-scale cross-engine check is q_asof_purchase vs DuckDB's native
ASOF LEFT JOIN (tests/test_oracle_parity.py); these unit tests pin the
edge semantics that oracle rows can't isolate.
"""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

from loan_etl_data_pipeline_spark.operators.joins import asof_join


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts(10)),   # matches r@10 (inclusive)
            (2, "u1", _ts(25)),   # matches r@20
            (3, "u1", _ts(5)),    # before all rights -> null
            (4, "u2", _ts(30)),   # u2 has no rights -> null
            (5, "u1", None),      # null ts -> null match, row kept
        ],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts(10), 100.0),
            ("u1", _ts(20), 200.0),
            ("u1", _ts(40), 400.0),
        ],
        "user_id string, ts timestamp, value double",
    )
    return left, right


def _collect(df):
    return {r["event_id"]: r for r in df.collect()}


def test_backward_inclusive_and_nulls(frames):
    left, right = frames
    got = _collect(asof_join(left, right, on="user_id"))
    assert len(got) == 5  # left row count preserved
    assert got[1]["value_r"] == 100.0 and got[1]["ts_r"] == _ts(10)  # inclusive
    assert got[2]["value_r"] == 200.0
    assert got[3]["value_r"] is None  # before all right rows
    assert got[4]["value_r"] is None  # key with no right side
    assert got[5]["value_r"] is None and got[5]["ts_r"] is None  # null left ts


def test_forward(frames):
    left, right = frames
    got = _collect(asof_join(left, right, on="user_id", direction="forward"))
    assert got[1]["value_r"] == 100.0  # inclusive at equal ts
    assert got[2]["value_r"] == 400.0  # next right after 25 is 40
    assert got[3]["value_r"] == 100.0
    assert got[4]["value_r"] is None


def test_tolerance_voids_stale_matches(frames):
    left, right = frames
    got = _collect(asof_join(left, right, on="user_id", tolerance="4 minutes"))
    assert got[1]["value_r"] == 100.0  # gap 0 <= 4m
    assert got[2]["value_r"] is None  # gap 5m > 4m
    assert got[2]["ts_r"] is None  # whole struct voided, not just one field


def test_right_ties_pick_greatest_payload(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts(10))], "event_id long, user_id string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("u1", _ts(10), 1.0), ("u1", _ts(10), 9.0), ("u1", _ts(10), 5.0)],
        "user_id string, ts timestamp, value double",
    )
    for n in (1, 3):
        got = _collect(asof_join(left.repartition(n), right.repartition(n), on="user_id"))
        assert got[1]["value_r"] == 9.0  # greatest (ts, value) struct, any partitioning


def test_suffix_and_bad_direction(frames):
    left, right = frames
    out = asof_join(left, right, on="user_id", suffix="_p")
    assert set(out.columns) == {"user_id", "event_id", "ts", "ts_p", "value_p"}
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, on="user_id", direction="nearest")


def test_asof_matches_pandas_merge_asof(spark):
    """Property check against an independent implementation: pandas
    ``merge_asof`` (both directions, with and without tolerance) on
    randomized frames. (key, ts) kept unique on the right so the two
    implementations' tie rules can't diverge."""
    import random

    import pandas as pd

    rng = random.Random(42)
    for trial in range(3):
        keys = ["u1", "u2", "u3"]
        left_pd = pd.DataFrame(
            {
                "event_id": range(30),
                "user_id": [rng.choice(keys) for _ in range(30)],
                "ts": [_ts(rng.randrange(0, 59)) for _ in range(30)],
            }
        )
        right_rows = {
            (k, _ts(m))
            for k in keys
            for m in rng.sample(range(0, 59), rng.randrange(1, 12))
        }
        right_pd = pd.DataFrame(
            [(k, t, float(hash((k, t)) % 1000)) for k, t in sorted(right_rows)],
            columns=["user_id", "ts", "value"],
        )
        for direction, tolerance in [
            ("backward", None),
            ("forward", None),
            ("backward", "7 minutes"),
        ]:
            expected = pd.merge_asof(
                left_pd.sort_values("ts", kind="stable"),
                right_pd.sort_values("ts", kind="stable"),
                on="ts",
                by="user_id",
                direction=direction,
                tolerance=pd.Timedelta("7 minutes") if tolerance else None,
                suffixes=("", "_r"),
            )
            exp = {
                r.event_id: (None if pd.isna(r.value) else r.value)
                for r in expected.itertuples()
            }
            got = {
                r["event_id"]: r["value_r"]
                for r in asof_join(
                    spark.createDataFrame(left_pd),
                    spark.createDataFrame(right_pd),
                    on="user_id",
                    direction=direction,
                    tolerance=tolerance,
                ).collect()
            }
            assert got == exp, f"trial {trial} {direction} tol={tolerance}"


def test_range_join_matches_naive(spark):
    """Binned range join == naive equi-join + BETWEEN filter, including
    windows that straddle a bin boundary."""
    import random

    from loan_etl_data_pipeline_spark.operators.joins import range_join

    rng = random.Random(7)
    left = spark.createDataFrame(
        [(i, f"u{rng.randrange(4)}", _ts(rng.randrange(0, 59))) for i in range(40)],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [(f"u{rng.randrange(4)}", _ts(rng.randrange(0, 59)), float(i)) for i in range(60)],
        "user_id string, ts timestamp, value double",
    )
    got = range_join(left, right, on="user_id", lower=-180.0, upper=300.0)
    naive = (
        left.join(right.selectExpr("user_id", "ts AS ts_r", "value AS value_r"), "user_id")
        .filter(
            (F.col("ts_r") >= F.col("ts") - F.expr("INTERVAL 180 SECONDS"))
            & (F.col("ts_r") <= F.col("ts") + F.expr("INTERVAL 300 SECONDS"))
        )
    )
    key = lambda r: (r["event_id"], r["ts_r"], r["value_r"])  # noqa: E731
    assert sorted(map(key, got.collect())) == sorted(map(key, naive.collect()))
    with pytest.raises(ValueError, match="upper > lower"):
        range_join(left, right, on="user_id", lower=5.0, upper=5.0)


def test_single_shuffle_plan(frames):
    left, right = frames
    plan = asof_join(left, right, on="user_id")._jdf.queryExecution().executedPlan().toString()
    # union-scan form: exactly one exchange (the window's key partitioning);
    # a join-based formulation would show 2+ plus a join node
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_asof_numeric_event_time_with_tolerance(spark):
    """Numeric ts columns work end to end, including numeric tolerance
    (an interval string against numeric ts raises a clear error)."""
    left = spark.createDataFrame(
        [(1, "u", 100.0), (2, "u", 500.0)], "event_id long, k string, ts double"
    )
    right = spark.createDataFrame(
        [("u", 90.0, 7.0), ("u", 480.0, 9.0)], "k string, ts double, v double"
    )
    got = {
        r["event_id"]: r["v_r"]
        for r in asof_join(left, right, on="k", tolerance=15.0).collect()
    }
    assert got == {1: 7.0, 2: None}  # gap 10 <= 15 matches; gap 20 voided
    with pytest.raises(ValueError, match="numeric tolerance"):
        asof_join(left, right, on="k", tolerance="1 hour").collect()


# --- calendar resample / gap fill ------------------------------------------


def test_resample_fills_gaps_and_flags_observed(spark):
    from loan_etl_data_pipeline_spark.operators.windows import resample_timeseries

    df = spark.createDataFrame(
        [
            (1, "2024-01-03 10:00:00", 10),
            (1, "2024-01-03 12:00:00", 11),  # same day, later ts wins
            (1, "2024-01-06 00:00:00", 60),  # 2-day gap before this
            (2, "2024-02-01 00:00:00", 5),  # single observation
        ],
        "k long, ts string, v long",
    ).withColumn("ts", F.to_timestamp("ts"))
    rows = resample_timeseries(df, "k", "ts", "v", unit="day").collect()
    got = {(r["k"], str(r["period"])): (r["v"], r["is_observed"]) for r in rows}
    assert got == {
        (1, "2024-01-03"): (11, True),
        (1, "2024-01-04"): (11, False),
        (1, "2024-01-05"): (11, False),
        (1, "2024-01-06"): (60, True),
        (2, "2024-02-01"): (5, True),
    }


def test_resample_rejects_bad_unit(spark):
    import pytest as _pytest

    from loan_etl_data_pipeline_spark.operators.windows import resample_timeseries

    df = spark.createDataFrame([(1, "2024-01-01", 1)], "k long, ts string, v long")
    with _pytest.raises(ValueError):
        resample_timeseries(df, "k", "ts", "v", unit="hour")


def test_fuzzy_join_dotted_column_names(spark):
    """Both the length prune and the levenshtein must treat a dotted
    column name as a name, not a struct path (the prune previously went
    through bare F.col and broke on dots)."""
    from loan_etl_data_pipeline_spark.operators.joins import fuzzy_blocked_join

    left = spark.createDataFrame(
        [(1, "x", "smith")], ["lid", "blk", "l.name"]
    )
    right = spark.createDataFrame(
        [(10, "x", "smyth"), (11, "x", "jones")], ["rid", "blk", "r.name"]
    )
    out = fuzzy_blocked_join(
        left,
        right,
        block_on="blk",
        left_col="l.name",
        right_col="r.name",
        max_distance=1,
    )
    rows = out.collect()
    assert [(r["lid"], r["rid_r"], r["distance"]) for r in rows] == [(1, 10, 1)]
