"""HLL sketches (functions/sketches.py): accuracy vs exact, and the
mergeability contract that makes them useful as pre-aggregated tables."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from loan_etl_data_pipeline_spark.functions.sketches import (
    distinct_sketches,
    estimate,
    merge_sketches,
)
from loan_etl_data_pipeline_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def test_estimates_track_exact(events):
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    est = {
        r["event_type"]: r["approx_distinct"]
        for r in estimate(distinct_sketches(events, "event_type", "user_id")).collect()
    }
    assert set(est) == set(exact)
    for t, n in exact.items():
        assert abs(est[t] - n) <= max(3, 0.05 * n), f"{t}: est {est[t]} vs exact {n}"


def test_split_then_merge_equals_single_pass(events):
    """Daily sketches unioned == one global sketch, bit-for-bit estimates —
    the property that lets a 100 TB pipeline persist sketch tables."""
    daily = distinct_sketches(
        events.withColumn("day", F.to_date("ts")), ["day", "event_type"], "user_id"
    )
    merged = estimate(merge_sketches(daily, "event_type"))
    single = estimate(distinct_sketches(events, "event_type", "user_id"))
    got = {r["event_type"]: r["approx_distinct"] for r in merged.collect()}
    want = {r["event_type"]: r["approx_distinct"] for r in single.collect()}
    assert got == want


def test_approx_quantiles_rank_error(spark, sf_dir):
    """GK approx percentiles: each estimate's true rank within 1% of the
    target quantile rank (the operator's contract at accuracy=10000)."""
    from loan_etl_data_pipeline_spark.queries import q_approx_quantiles

    rows = q_approx_quantiles(spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    for r in rows:
        flag = r["l_returnflag"]
        vals = sorted(
            x["l_quantity"] for x in li.filter(F.col("l_returnflag") == flag).collect()
        )
        n = len(vals)
        for col, q in [("p25", 0.25), ("p50", 0.5), ("p75", 0.75), ("p99", 0.99)]:
            est = r[col]
            # the domain is discrete (ties): the estimate is correct when
            # the TARGET rank falls inside the estimate's tie-group rank
            # interval, within the sketch's epsilon
            lo = sum(1 for v in vals if v < est)
            hi = sum(1 for v in vals if v <= est)
            assert lo / n - 0.01 <= q <= hi / n + 0.01, (flag, col, lo, hi, n, q)


def test_sliding_distinct_merge_equals_direct(events):
    """Each sliding estimate must EQUAL the single-pass sketch estimate
    over the same trailing span (HLL union of same-lg_k sketches is
    lossless), and track the exact trailing distinct within HLL error."""
    from loan_etl_data_pipeline_spark.functions.sketches import sliding_distinct

    got = {
        r.win_start: r.approx_distinct
        for r in sliding_distinct(
            events, "ts", "user_id", slide="1 hour", width_slides=6
        ).collect()
    }
    assert len(got) > 10

    # tumble starts in order; recompute each trailing-6 span directly
    tumbles = sorted(
        r.ws
        for r in events.select(
            F.window("ts", "1 hour").start.alias("ws")
        ).distinct().collect()
    )
    import random

    rnd = random.Random(7)
    for idx in rnd.sample(range(len(tumbles)), 8):
        span = tumbles[max(0, idx - 5) : idx + 1]
        lo, hi = span[0], tumbles[idx]
        direct = (
            events.filter(
                (F.window("ts", "1 hour").start >= F.lit(lo))
                & (F.window("ts", "1 hour").start <= F.lit(hi))
            )
            .agg(
                F.hll_sketch_estimate(
                    F.hll_sketch_agg("user_id", F.lit(12))
                ).cast("bigint")
            )
            .collect()[0][0]
        )
        assert got[tumbles[idx]] == direct, (tumbles[idx], got[tumbles[idx]], direct)
        exact = (
            events.filter(
                (F.window("ts", "1 hour").start >= F.lit(lo))
                & (F.window("ts", "1 hour").start <= F.lit(hi))
            )
            .select("user_id")
            .distinct()
            .count()
        )
        assert abs(got[tumbles[idx]] - exact) <= max(3, 0.05 * exact)


# ---- count-min sketch (cms_build / cms_merge / cms_query) --------------


def test_cms_never_underestimates_and_is_tight_when_wide(spark):
    from loan_etl_data_pipeline_spark.functions.sketches import (
        cms_build,
        cms_query,
    )

    df = spark.range(0, 5000).selectExpr("CAST(id % 37 AS STRING) AS k")
    true = {r["k"]: r["c"] for r in df.groupBy("k").count().withColumnRenamed("count", "c").collect()}
    keys = df.select("k").distinct()
    sketch = cms_build(df, "k", depth=4, width=1024)
    got = {r["k"]: r["est"] for r in cms_query(sketch, keys, "k", depth=4, width=1024).collect()}
    assert all(got[k] >= true[k] for k in true)  # the CMS one-sided bound
    # 37 keys in 1024 columns: collisions vanish → exact
    assert got == true


def test_cms_merge_equals_one_shot(spark):
    from loan_etl_data_pipeline_spark.functions.sketches import (
        cms_build,
        cms_merge,
        cms_query,
    )

    df = spark.range(0, 2000).selectExpr("CAST(id % 23 AS STRING) AS k")
    halves = [df.filter(f"id % 2 = {i}") for i in (0, 1)]
    merged = cms_merge(*[cms_build(h, "k", depth=3, width=64) for h in halves])
    oneshot = cms_build(df, "k", depth=3, width=64)
    keys = df.select("k").distinct()
    a = sorted(map(tuple, cms_query(merged, keys, "k", depth=3, width=64).collect()))
    b = sorted(map(tuple, cms_query(oneshot, keys, "k", depth=3, width=64).collect()))
    assert a == b


def test_cms_weighted_and_absent_keys(spark):
    from loan_etl_data_pipeline_spark.functions.sketches import (
        cms_build,
        cms_query,
    )

    df = spark.createDataFrame(
        [("a", 10), ("a", 5), ("b", 7)], ["k", "w"]
    )
    sketch = cms_build(df, "k", depth=4, width=512, weight_col="w")
    keys = spark.createDataFrame([("a",), ("b",), ("zzz",)], ["k"])
    got = {r["k"]: r["est"] for r in cms_query(sketch, keys, "k", depth=4, width=512).collect()}
    assert got["a"] == 15 and got["b"] == 7
    assert got["zzz"] == 0  # absent key: min over empty cells is 0


def test_cms_validates(spark):
    import pytest as _pt

    from loan_etl_data_pipeline_spark.functions.sketches import (
        cms_build,
        cms_merge,
    )

    df = spark.range(3).selectExpr("CAST(id AS STRING) AS k")
    with _pt.raises(ValueError):
        cms_build(df, "k", depth=0, width=8)
    with _pt.raises(ValueError):
        cms_merge()
