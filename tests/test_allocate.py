"""largest_remainder (operators/allocate.py): exact integer proration.
The sf-scale cross-engine check is q_proration (SQL-window oracle)."""

from __future__ import annotations

import pyspark.sql.functions as F

from loan_etl_data_pipeline_spark.operators.allocate import largest_remainder


def test_largest_remainder_sums_to_budget(spark):
    df = spark.createDataFrame(
        [("a", 1, 1), ("a", 2, 1), ("a", 3, 1),
         ("b", 1, 3), ("b", 2, 7)],
        ["grp", "seq", "w"],
    )
    out = largest_remainder(df, "grp", "w", budget=100, order_col="seq")
    sums = {r["grp"]: r["s"] for r in
            out.groupBy("grp").agg(F.sum("alloc").alias("s")).collect()}
    assert sums == {"a": 100, "b": 100}
    rows = {(r["grp"], r["seq"]): r["alloc"] for r in out.collect()}
    # a: 100/3 -> 33 each, remainder 1 goes to lowest seq (equal stakes)
    assert rows[("a", 1)] == 34 and rows[("a", 2)] == 33 and rows[("a", 3)] == 33
    # b: exact split 30/70, no remainder
    assert rows[("b", 1)] == 30 and rows[("b", 2)] == 70


def test_largest_remainder_tiebreak_prefers_bigger_stake(spark):
    # budget 10 over weights 1,2: floors 3,6; remainders 1*10%3==10%3=1,
    # 20%3=2 -> the single leftover unit goes to the larger remainder
    df = spark.createDataFrame([("g", 1, 1), ("g", 2, 2)], ["grp", "seq", "w"])
    out = {r["seq"]: r["alloc"] for r in
           largest_remainder(df, "grp", "w", budget=10, order_col="seq").collect()}
    assert out == {1: 3, 2: 7} and sum(out.values()) == 10


def test_largest_remainder_zero_weights_rotation(spark):
    df = spark.createDataFrame(
        [("g", i, 0) for i in range(1, 4)], ["grp", "seq", "w"]
    )
    out = {r["seq"]: r["alloc"] for r in
           largest_remainder(df, "grp", "w", budget=7, order_col="seq").collect()}
    # 7 over 3 zero-weight members: 2 each + 1 extra for the first
    assert out == {1: 3, 2: 2, 3: 2}
