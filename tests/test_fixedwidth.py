"""read_fixed_width (sources/fixedwidth.py): typed slicing + quarantine."""

from __future__ import annotations

import pytest

from loan_etl_data_pipeline_spark.sources.fixedwidth import read_fixed_width

SPECS = [
    ("loan_id", 1, 6, "bigint"),
    ("amount", 7, 9, "double"),
    ("grade", 16, 2, "string"),
]


def _write(tmp_path, lines):
    p = tmp_path / "loans.txt"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_fixed_width_typed_read(spark, tmp_path):
    path = _write(tmp_path, [
        "000001 12500.5 A+",
        "000002   900.0 B ",
    ])
    rows = {r["loan_id"]: r for r in
            read_fixed_width(spark, path, SPECS).collect()}
    assert rows[1]["amount"] == 12500.5 and rows[1]["grade"] == "A+"
    assert rows[2]["amount"] == 900.0 and rows[2]["grade"] == "B"


def test_fixed_width_bad_field_nulls_not_fails(spark, tmp_path):
    path = _write(tmp_path, ["00000X garbage! C"])
    r = read_fixed_width(spark, path, SPECS).collect()[0]
    assert r["loan_id"] is None and r["amount"] is None and r["grade"] == "C"


def test_fixed_width_short_line_quarantine(spark, tmp_path):
    path = _write(tmp_path, ["000001 12500.5 A+", "short"])
    # without corrupt_col: dropped
    assert read_fixed_width(spark, path, SPECS).count() == 1
    # with corrupt_col: kept, all fields null, raw line preserved
    df = read_fixed_width(spark, path, SPECS, corrupt_col="_corrupt")
    bad = df.filter(df["_corrupt"].isNotNull()).collect()
    assert len(bad) == 1 and bad[0]["_corrupt"] == "short"
    assert bad[0]["loan_id"] is None


def test_fixed_width_rejects_bad_spec(spark, tmp_path):
    path = _write(tmp_path, ["x"])
    with pytest.raises(ValueError):
        read_fixed_width(spark, path, [("a", 0, 3, "string")])
    with pytest.raises(ValueError):
        read_fixed_width(spark, path, [])
