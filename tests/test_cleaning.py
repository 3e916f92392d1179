"""Property tests for the cleaning operator library (SURVEY §7 M2).

The engine's headline optimization over the reference is the melt-based
single-job ``column_modes`` replacing the reference's one-full-job-per-
column loop (reference: airflow/dags/etl/pyspark_etl.py:14-21). These
tests pin the semantic contract:

- melt plan ≡ reference-faithful per-column plan, row for row —
  including a null-majority column (fill must be a no-op) and a tie
  (resolved deterministically: count DESC, value ASC in string order,
  nulls first);
- ``split_timestamp`` format priority, null-on-garbage, original-column
  retention, and schema tolerance;
- the shape-guarded multi-format parse is equivalent to the unguarded
  try-all-formats coalesce.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from loan_etl_data_pipeline_spark.operators.cleaning import (
    TS_FORMATS,
    column_modes,
    column_modes_per_column,
    fill_nulls_with_mode,
    fill_nulls_with_mode_faithful,
    parse_timestamp_multi,
    split_timestamp,
)


@pytest.fixture(scope="module")
def messy(spark):
    """Nulls, a clear mode, a two-way tie, a null-majority column, ints."""
    rows = [
        # (id, cat mode 'b'; tied 3-3 'x'/'y'; mostly_null majority null; num mode 7 over 2 nulls)
        (1, "a", "x", None, 7),
        (2, "b", "y", None, 7),
        (3, "b", "x", "rare", None),
        (4, "b", "y", None, 9),
        (5, None, None, None, 7),
        (6, "a", "x", "rare", None),
        (7, None, "y", None, 7),
    ]
    return spark.createDataFrame(
        rows, "id long, cat string, tied string, mostly_null string, num long"
    )


def test_column_modes_melt_equals_per_column(messy):
    melt = column_modes(messy)
    per_col = column_modes_per_column(messy)
    assert set(melt) == set(per_col)
    for c in per_col:
        native = per_col[c]
        assert melt[c] == (None if native is None else str(native)), c


def test_mode_values_and_tie_break(messy):
    modes = column_modes(messy)
    assert modes["cat"] == "b"  # clear winner (3 vs 2)
    assert modes["tied"] == "x"  # 3-3 tie with 'y' -> value ASC wins
    assert modes["mostly_null"] is None  # null is the most frequent "value"
    assert modes["num"] == "7"


def test_fill_melt_equals_faithful(messy):
    a = sorted(map(tuple, fill_nulls_with_mode(messy).collect()))
    b = sorted(map(tuple, fill_nulls_with_mode_faithful(messy).collect()))
    assert a == b


def test_fill_contract(messy):
    got = {r["id"]: r for r in fill_nulls_with_mode(messy).collect()}
    assert got[5]["cat"] == "b" and got[7]["cat"] == "b"
    assert got[5]["tied"] == "x"
    # null-majority column must be untouched (reference contract)
    assert got[5]["mostly_null"] is None
    # int column: mode re-cast to native type, non-nulls untouched
    assert got[3]["num"] == 7 and got[4]["num"] == 9


def test_fill_preserves_schema(messy):
    assert fill_nulls_with_mode(messy).dtypes == messy.dtypes


@pytest.fixture(scope="module")
def ts_frame(spark):
    rows = [
        (1, "2024-01-15 10:30:00"),  # format 1
        (2, "01/16/2024 11:00:00"),  # format 2
        (3, "17-01-2024 12:15:30"),  # format 3
        (4, "not a timestamp"),
        (5, None),
    ]
    return spark.createDataFrame(rows, "id long, timestamp string")


def test_split_timestamp_formats_and_garbage(ts_frame):
    got = {r["id"]: r for r in split_timestamp(ts_frame).collect()}
    assert (got[1]["date"], got[1]["time"]) == ("2024-01-15", "10:30:00")
    assert (got[2]["date"], got[2]["time"]) == ("2024-01-16", "11:00:00")
    assert (got[3]["date"], got[3]["time"]) == ("2024-01-17", "12:15:30")
    assert (got[4]["date"], got[4]["time"]) == (None, None)
    assert (got[5]["date"], got[5]["time"]) == (None, None)
    # original column kept (reference: airflow/dags/etl/pyspark_etl.py:32)
    assert got[1]["timestamp"] == "2024-01-15 10:30:00"


def test_split_timestamp_schema_tolerant(ts_frame):
    no_ts = ts_frame.select("id")
    assert split_timestamp(no_ts).columns == ["id"]


def test_guarded_parse_equals_unguarded(spark):
    """The rlike shape guards must not change parse results."""
    tricky = [
        "2024-01-15 10:30:00", "01/16/2024 11:00:00", "17-01-2024 12:15:30",
        "0015-03-19 00:00:00", "2023-13-45 00:00:00", "99/99/9999 00:00:00",
        "99-99-9999 00:00:00", "12-11-2020 23:59:59", "1234-56-78 00:00:00",
        "", "garbage", "2024-01-15", "10:30:00", None,
    ]
    df = spark.createDataFrame([(s,) for s in tricky], "s string")
    unguarded = F.coalesce(
        *[F.try_to_timestamp(F.col("s"), F.lit(f)) for f in TS_FORMATS]
    )
    out = df.select(
        "s",
        parse_timestamp_multi("s").alias("guarded"),
        unguarded.alias("plain"),
    ).collect()
    for r in out:
        assert r["guarded"] == r["plain"], r["s"]
