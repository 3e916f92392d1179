"""Incremental aggregate maintenance (operators/incremental.py):
merge algebra, fold associativity, fresh-key passthrough.
Cross-engine check is q_incremental_agg vs a plain GROUP BY oracle
(tests/test_oracle_parity.py)."""

from __future__ import annotations

import pytest

from loan_etl_data_pipeline_spark.operators.incremental import (
    aggregate_batch,
    fold_batches,
    merge_aggregates,
)

MEASURES = {
    "n": ("count", None),
    "s": ("sum", "v"),
    "lo": ("min", "v"),
    "hi": ("max", "v"),
}


def _rows(df):
    return {
        r["k"]: (r["n"], r["s"], r["lo"], r["hi"]) for r in df.collect()
    }


def test_fold_equals_one_shot(spark):
    import pyspark.sql.functions as F

    full = spark.createDataFrame(
        [(i % 4, (i * 7) % 23) for i in range(200)], "k long, v long"
    )
    batches = [full.filter(F.col("v") % 3 == i) for i in range(3)]
    got = _rows(fold_batches(batches, ["k"], MEASURES))
    want = _rows(aggregate_batch(full, ["k"], MEASURES))
    assert got == want


def test_fold_order_invariant(spark):
    import pyspark.sql.functions as F

    full = spark.createDataFrame(
        [(i % 3, i) for i in range(90)], "k long, v long"
    )
    batches = [full.filter(F.col("v") % 3 == i) for i in range(3)]
    fwd = _rows(fold_batches(batches, ["k"], MEASURES))
    rev = _rows(fold_batches(batches[::-1], ["k"], MEASURES))
    assert fwd == rev


def test_fresh_and_stale_keys_merge(spark):
    prev_batch = spark.createDataFrame([(1, 10), (1, 20), (2, 5)], "k long, v long")
    delta = spark.createDataFrame([(2, 50), (3, 7)], "k long, v long")
    prev = aggregate_batch(prev_batch, ["k"], MEASURES)
    out = _rows(
        merge_aggregates(
            prev, aggregate_batch(delta, ["k"], MEASURES), ["k"], MEASURES
        )
    )
    assert out == {
        1: (2, 30, 10, 20),  # untouched by delta
        2: (2, 55, 5, 50),  # merged: counts add, min keeps 5, max takes 50
        3: (1, 7, 7, 7),  # fresh key passes through
    }


def test_unsupported_kind_raises(spark):
    df = spark.createDataFrame([(1, 2)], "k long, v long")
    with pytest.raises(ValueError, match="unsupported measure kind"):
        aggregate_batch(df, ["k"], {"bad": ("median", "v")})


def test_empty_batch_list_raises():
    with pytest.raises(ValueError, match="at least one"):
        fold_batches([], ["k"], MEASURES)


# ---- join-view maintenance (join_view_delta / fold_join_batches) ------


def _ab(spark):
    a = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "z"), (3, "w")], ["k", "av"]
    )
    b = spark.createDataFrame(
        [(1, 10), (2, 20), (2, 21), (4, 40)], ["k", "bv"]
    )
    return a, b


def test_join_view_fold_equals_one_shot(spark):
    from loan_etl_data_pipeline_spark.operators.incremental import (
        fold_join_batches,
    )

    a, b = _ab(spark)
    # misaligned splits so all three delta terms fire
    a_batches = [a.filter(f"av {c}") for c in ("< 'y'", ">= 'y' AND av < 'z'", ">= 'z'")]
    b_batches = [b.filter(f"bv {c}") for c in ("< 20", ">= 20 AND bv < 40", ">= 40")]
    view = sorted(map(tuple, fold_join_batches(a_batches, b_batches, ["k"]).collect()))
    full = sorted(map(tuple, a.join(b, ["k"]).collect()))
    assert view == full and len(view) == 4


def test_join_view_delta_terms_are_disjoint_and_complete(spark):
    from loan_etl_data_pipeline_spark.operators.incremental import (
        join_view_delta,
    )

    a, b = _ab(spark)
    a_old, da = a.filter("av <= 'x'"), a.filter("av > 'x'")
    b_old, db = b.filter("bv <= 20"), b.filter("bv > 20")
    delta = join_view_delta(a_old, da, b_old, db, ["k"]).collect()
    base = a_old.join(b_old, ["k"]).collect()
    full = a.join(b, ["k"]).collect()
    # base ∪ delta == full as multisets (no dup, no loss)
    got = sorted(map(tuple, base)) + sorted(map(tuple, delta))
    assert sorted(got) == sorted(map(tuple, full))


def test_join_view_empty_deltas_are_noop(spark):
    from loan_etl_data_pipeline_spark.operators.incremental import (
        join_view_delta,
    )

    a, b = _ab(spark)
    empty_a = a.filter("1 = 0")
    empty_b = b.filter("1 = 0")
    assert join_view_delta(a, empty_a, b, empty_b, ["k"]).count() == 0


def test_join_view_validates_batches(spark):
    from loan_etl_data_pipeline_spark.operators.incremental import (
        fold_join_batches,
    )

    a, b = _ab(spark)
    with pytest.raises(ValueError, match="equal-length"):
        fold_join_batches([a], [b, b], ["k"])
    with pytest.raises(ValueError, match="equal-length"):
        fold_join_batches([], [], ["k"])
