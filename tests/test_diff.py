"""table_diff (operators/diff.py): change classification, null-safe
semantics, compare_cols scoping."""

from __future__ import annotations

from loan_etl_data_pipeline_spark.operators.diff import table_diff


def test_table_diff_classifies_changes(spark):
    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", None), (4, "d", 4.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 1.0),    # unchanged → absent from output
            (2, "B", 2.5),    # changed: s and v
            (3, "c", None),   # unchanged incl. null == null
            (5, "e", 5.0),    # added
        ],
        "k long, s string, v double",
    )
    got = {r["k"]: (r["change_type"], r["changed_cols"]) for r in
           table_diff(old, new, "k").collect()}
    assert got == {
        2: ("changed", "s,v"),
        4: ("removed", ""),
        5: ("added", ""),
    }


def test_table_diff_null_value_transitions(spark):
    old = spark.createDataFrame([(1, None), (2, "x")], "k long, s string")
    new = spark.createDataFrame([(1, "y"), (2, None)], "k long, s string")
    got = {r["k"]: r["change_type"] for r in table_diff(old, new, "k").collect()}
    # NULL → value and value → NULL are both changes
    assert got == {1: "changed", 2: "changed"}


def test_table_diff_compare_cols_scoping(spark):
    old = spark.createDataFrame([(1, "a", 1.0)], "k long, s string, v double")
    new = spark.createDataFrame([(1, "a", 9.0)], "k long, s string, v double")
    # v excluded → no visible change
    assert table_diff(old, new, "k", compare_cols=["s"]).count() == 0
    rows = table_diff(old, new, "k", compare_cols=["v"]).collect()
    assert rows[0]["changed_cols"] == "v"


def test_table_diff_composite_keys(spark):
    old = spark.createDataFrame([(1, "x", 10), (1, "y", 20)], "a long, b string, v int")
    new = spark.createDataFrame([(1, "x", 11), (2, "y", 20)], "a long, b string, v int")
    got = {(r["a"], r["b"]): r["change_type"] for r in
           table_diff(old, new, ["a", "b"]).collect()}
    assert got == {(1, "x"): "changed", (1, "y"): "removed", (2, "y"): "added"}
