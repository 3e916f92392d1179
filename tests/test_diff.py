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


def test_reconcile_one_to_one_semantics(spark):
    """i-th ledger entry pairs with i-th feed entry per group; leftovers
    are per-side breaks; matched rows carry both values."""
    from loan_etl_data_pipeline_spark.operators.diff import reconcile_one_to_one

    a = spark.createDataFrame(
        [  # (key, t, amount)
            (1, 1, 100), (1, 2, 101), (1, 3, 102),   # three ledger entries
            (2, 1, 500),
        ],
        "k long, t long, v long",
    )
    b = spark.createDataFrame(
        [
            (1, 5, 99), (1, 6, 103),                 # only two feed entries
            (3, 1, 900),
        ],
        "k long, t long, v long",
    )
    out = {
        (r["k"], r["rk"]): (r["v_a"], r["v_b"], r["status"])
        for r in reconcile_one_to_one(a, b, ["k"], ["t"], "v").collect()
    }
    assert out[(1, 1)] == (100, 99, "matched")
    assert out[(1, 2)] == (101, 103, "matched")
    assert out[(1, 3)] == (102, None, "only_a")
    assert out[(2, 1)] == (500, None, "only_a")
    assert out[(3, 1)] == (None, 900, "only_b")
    assert len(out) == 5


def test_reconcile_null_values_still_present(spark):
    """ADVICE r4 (medium): row presence must come from explicit markers,
    not value_col nullability — a matched pair whose A-side (or both
    sides') value is NULL is 'matched', and a NULL-valued unmatched
    A-row is 'only_a', never 'only_b'."""
    from loan_etl_data_pipeline_spark.operators.diff import reconcile_one_to_one

    a = spark.createDataFrame(
        [(1, 1, None), (1, 2, None), (2, 1, None)],
        "k long, t long, v long",
    )
    b = spark.createDataFrame(
        [(1, 5, 99), (1, 6, None)],
        "k long, t long, v long",
    )
    out = {
        (r["k"], r["rk"]): (r["v_a"], r["v_b"], r["status"])
        for r in reconcile_one_to_one(a, b, ["k"], ["t"], "v").collect()
    }
    assert out[(1, 1)] == (None, 99, "matched")   # NULL A-value, matched
    assert out[(1, 2)] == (None, None, "matched")  # NULL both sides
    assert out[(2, 1)] == (None, None, "only_a")   # NULL-valued break
    assert len(out) == 3
