"""values_frame must be a drop-in for createDataFrame on small
driver-known frames: identical schema (incl. nullability) and values,
without the pickled-Python-RDD worker launches."""

from __future__ import annotations

import pytest

from loan_etl_data_pipeline_spark.functions.localframe import values_frame

CASES = [
    # escaping: quote, backslash, NULL, NaN
    (
        [("a'b\\c", 1, 2.5), ("x", None, float("nan"))],
        "s string, i bigint, d double",
    ),
    # nested array type
    ([(0, [1.0, 2.25]), (1, [0.1, -3.5])], "cell int, centroid array<double>"),
    ([(1, 2)], "ba int, bb int"),
    # empty frame (VALUES cannot be empty — WHERE-false fallback)
    ([], "tok string, n bigint"),
    ([("t o k",)], "tok string"),
    # bool + infinities
    ([(True, float("inf")), (False, float("-inf"))], "b boolean, d double"),
]


@pytest.mark.parametrize("rows,schema", CASES)
def test_values_frame_matches_createdataframe(spark, rows, schema):
    a = values_frame(spark, rows, schema)
    b = spark.createDataFrame(rows, schema)
    assert a.schema == b.schema
    assert sorted(map(str, a.collect())) == sorted(map(str, b.collect()))


def test_values_frame_is_jvm_local_relation(spark):
    # the whole point: no Python-RDD scan in the plan
    plan = (
        values_frame(spark, [("x", 1)], "s string, n bigint")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "MapPartitionsRDD" not in plan


def test_values_frame_rejects_unrenderable(spark):
    with pytest.raises(TypeError):
        values_frame(spark, [({"a": 1},)], "m map<string,int>")
