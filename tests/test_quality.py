"""Constraint gate (operators/quality.py): violation counting per rule
family, single-pass plan shape, and edge semantics (nulls, empty input)."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from loan_etl_data_pipeline_spark.operators import quality


@pytest.fixture()
def frame(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", -5.0),   # out of range
            (2, "c", 20.0),   # duplicate key
            (None, "a", 5.0), # null key
            (5, "zz", None),  # bad status; null value not a range violation
        ],
        "k int, status string, v double",
    )


def test_rule_families(spark, frame):
    out = {
        r["rule"]: (r["violations"], r["passed"])
        for r in quality.check_constraints(
            frame,
            [
                quality.not_null("k"),
                quality.unique("k"),
                quality.in_range("v", 0, 100),
                quality.accepted_values("status", ["a", "b", "c"]),
                quality.matches("v_odd_check", F.col("v") >= -5.0),
            ],
        ).collect()
    }
    assert out["not_null(k)"] == (1, False)
    # 5 rows, 4 distinct keys (1, 2, None, 5) → 1 surplus
    assert out["unique(k)"] == (1, False)
    assert out["in_range(v,0,100)"] == (1, False)
    assert out["accepted_values(status)"] == (1, False)
    # null predicate counts as violation (the v=None row)
    assert out["v_odd_check"] == (1, False)


def test_all_pass_and_empty_input(spark):
    clean = spark.createDataFrame([(1, 5.0), (2, 6.0)], "k int, v double")
    out = quality.check_constraints(
        clean, [quality.not_null("k"), quality.unique("k")]
    ).collect()
    assert all(r["passed"] and r["violations"] == 0 for r in out)

    empty = clean.filter("k < 0")
    out = quality.check_constraints(
        empty, [quality.not_null("k"), quality.in_range("v", 0, 1)]
    ).collect()
    # empty input: sums are null → coalesced to 0 violations, passing
    assert all(r["passed"] and r["violations"] == 0 for r in out)


def test_rule_name_with_single_quote(spark, frame):
    out = quality.check_constraints(
        frame, [quality.matches("v isn't negative", F.col("v") >= 0)]
    ).collect()
    assert out[0]["rule"] == "v isn't negative"


def test_rejects_bad_specs(spark, frame):
    with pytest.raises(ValueError):
        quality.check_constraints(frame, [])
    with pytest.raises(ValueError):
        quality.check_constraints(
            frame, [quality.not_null("k"), quality.not_null("k")]
        )


def test_single_scan_plan(spark, frame):
    plan = (
        quality.check_constraints(
            frame,
            [
                quality.not_null("k"),
                quality.in_range("v", 0, 100),
                quality.accepted_values("status", ["a"]),
            ],
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one aggregate over one source scan — rules never multiply scans
    assert plan.count("Scan ") <= 1


def test_iqr_outliers_known_values(spark):
    """Hand-checked Tukey fences on a tiny group + outlier counting."""
    data = [("g", float(v)) for v in [1, 2, 3, 4, 100]] + [("h", 10.0)]
    df = spark.createDataFrame(data, "grp string, v double")
    rows = {r["grp"]: r for r in quality.iqr_outliers(df, "grp", "v").collect()}
    g = rows["g"]
    # cents quantiles of [100,200,300,400,10000]: q1=200, q3=400 cents->2,4
    assert g["q1"] == 2.0 and g["q3"] == 4.0
    assert g["lo_fence"] == 2.0 - 1.5 * 2.0 and g["hi_fence"] == 4.0 + 1.5 * 2.0
    assert g["n_rows"] == 5 and g["n_outliers"] == 1  # the 100
    h = rows["h"]  # single-value group: IQR 0, nothing flagged
    assert h["n_outliers"] == 0 and h["n_rows"] == 1


def test_observe_metrics_free_on_write(spark, tmp_path):
    """Observation metrics must match a separately-computed aggregate,
    and be collected by the WRITE action itself (no second scan)."""
    import pyspark.sql.functions as F

    from loan_etl_data_pipeline_spark.operators.quality import observe_metrics

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 30.0), (4, None)], "id long, v double"
    )
    observed, obs = observe_metrics(
        df,
        "etl_gate",
        {
            "n_rows": F.count(F.lit(1)),
            "n_null_v": F.sum(F.when(F.col("v").isNull(), 1).otherwise(0)),
            "v_cents": F.sum(F.floor(F.col("v") * 100).cast("bigint")),
        },
    )
    observed.write.mode("overwrite").parquet(str(tmp_path / "out"))
    got = obs.get
    assert got == {"n_rows": 4, "n_null_v": 2, "v_cents": 4000}
    # written data unaffected by the observation
    assert spark.read.parquet(str(tmp_path / "out")).count() == 4
    import pytest as _pytest

    with _pytest.raises(ValueError, match="metrics"):
        observe_metrics(df, "empty", {})


def test_sql_functions_inline_to_codegen(spark):
    """SQL-defined functions (functions/sqlfuncs.py): registered bodies
    must compute the shared idioms exactly and leave NO Python UDF in
    the plan (the body inlines as a plain expression)."""
    from loan_etl_data_pipeline_spark.functions.sqlfuncs import (
        register_sql_functions,
    )

    names = register_sql_functions(spark)
    assert set(names) == {"cents", "split_bucket", "int_share"}
    row = spark.sql(
        "SELECT cents(1.239) AS c, split_bucket('42', 's') AS b,"
        " int_share(3, 10, 4) AS q"
    ).collect()[0]
    import hashlib

    assert row["c"] == 123
    assert row["b"] == hashlib.md5(b"42s").hexdigest()[:4]
    assert row["q"] == 3 * 10 // 4
    plan = (
        spark.sql("SELECT cents(o) FROM (SELECT 1.5 AS o)")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # idempotent re-registration (CREATE OR REPLACE)
    register_sql_functions(spark)


def test_variant_and_json_paths_identical_on_dirty_input(spark):
    """The q_json_variant/q_json_extract value-identity must survive
    DIRTY data, not just the clean fixtures: malformed JSON nulls (no
    FAILFAST), and non-integer k values null on BOTH routes (a typed
    variant_get would coerce 2.5→2 / true→1 where try_cast nulls —
    found in review)."""
    from loan_etl_data_pipeline_spark.operators.json_ops import (
        props_stats,
        props_variant_stats,
    )

    rows = [
        ("a", "{bad"),
        ("b", '{"k": 2.5}'),
        ("b", '{"k": true}'),
        ("c", '{"k": 7}'),
        ("c", None),
        ("d", '{"x": 1}'),
    ]
    df = spark.createDataFrame(rows, "event_type string, props string")
    a = sorted(map(tuple, props_stats(df).collect()))
    b = sorted(map(tuple, props_variant_stats(df).collect()))
    assert a == b
    assert ("c", 1, 7, 7.0, 7, 7) in a  # the one clean int row counts


def test_fk_orphans_semantics(spark):
    """NULL child keys are not orphans; duplicate parent keys must not
    multiply child rows (distinct parent key set); orphans counted
    exactly."""
    from loan_etl_data_pipeline_spark.operators.quality import fk_orphans

    child = spark.createDataFrame(
        [(1,), (1,), (2,), (99,), (None,)], "k int"
    )
    parent = spark.createDataFrame([(1,), (1,), (2,)], "pk int")
    row = fk_orphans(child, "k", parent, "pk").collect()[0]
    assert row["relationship"] == "k->pk"
    assert row["n_child"] == 4  # NULL excluded
    assert row["n_orphans"] == 1  # only 99


def test_fd_violations_mixed(spark):
    df = spark.createDataFrame(
        [
            (1, "a"), (1, "a"),          # consistent group
            (2, "a"), (2, "b"),          # two distinct values → violation
            (3, None), (3, "c"),         # null + value mix → violation
            (4, None), (4, None),        # consistently null → holds
        ],
        "k int, v string",
    )
    r = quality.fd_violations(df, "k", "v").collect()[0]
    assert r["fd"] == "k->v"
    assert r["n_groups"] == 4
    assert r["n_violating_groups"] == 2
    assert r["n_violating_rows"] == 4


def test_fd_violations_compound_determinant_holds(spark):
    df = spark.createDataFrame(
        [(1, "x", 10), (1, "y", 20), (1, "x", 10)],
        "a int, b string, c int",
    )
    r = quality.fd_violations(df, ["a", "b"], "c").collect()[0]
    assert r["fd"] == "a,b->c"
    assert (r["n_groups"], r["n_violating_groups"], r["n_violating_rows"]) \
        == (2, 0, 0)


# ---- isotonic_fit (PAVA) -----------------------------------------------


def test_isotonic_known_answer(spark):
    from loan_etl_data_pipeline_spark.operators.quality import isotonic_fit

    # means: 1, 3, 2 — middle two pool to (3+2)/(1+1)=2.5; still ≥ 1 ✓
    bins = spark.createDataFrame(
        [(1, 10, 10), (2, 30, 10), (3, 20, 10)], ["x", "sy", "n"]
    )
    got = {
        r["x"]: (r["pool_lo"], r["fitted9"])
        for r in isotonic_fit(bins, "x", "sy", "n").collect()
    }
    assert got[1] == (1, 1_000_000_000)
    assert got[2] == (2, 2_500_000_000)
    assert got[3] == (2, 2_500_000_000)


def test_isotonic_cascading_merge(spark):
    from loan_etl_data_pipeline_spark.operators.quality import isotonic_fit

    # 5, 4, 3 — full cascade into one pool with mean 4
    bins = spark.createDataFrame(
        [(1, 5, 1), (2, 4, 1), (3, 3, 1)], ["x", "sy", "n"]
    )
    got = isotonic_fit(bins, "x", "sy", "n").collect()
    assert {r["pool_lo"] for r in got} == {1}
    assert {r["fitted9"] for r in got} == {4_000_000_000}


def test_isotonic_already_monotone_is_identity(spark):
    from loan_etl_data_pipeline_spark.operators.quality import isotonic_fit

    bins = spark.createDataFrame(
        [(i, i * 2, 2) for i in range(1, 6)], ["x", "sy", "n"]
    )
    got = isotonic_fit(bins, "x", "sy", "n").collect()
    assert all(r["pool_lo"] == r["x"] for r in got)
    assert all(r["fitted9"] == r["x"] * 1_000_000_000 for r in got)


def test_isotonic_output_is_monotone_and_weighted(spark):
    import random

    from loan_etl_data_pipeline_spark.operators.quality import isotonic_fit

    rnd = random.Random(3)
    rows = [(i, rnd.randint(0, 50), rnd.randint(1, 9)) for i in range(30)]
    bins = spark.createDataFrame(rows, ["x", "sy", "n"])
    got = sorted(
        (r["x"], r["pool_lo"], r["fitted9"])
        for r in isotonic_fit(bins, "x", "sy", "n").collect()
    )
    fitted = [f for _, _, f in got]
    assert fitted == sorted(fitted)  # non-decreasing
    # pool means preserve total mass: Σ n·mean == Σ sy (up to quantize)
    by_pool = {}
    for (x, lo, f), (xx, sy, n) in zip(got, sorted(rows)):
        by_pool.setdefault(lo, [0, 0])
        by_pool[lo][0] += sy
        by_pool[lo][1] += n
    for lo, (sy, n) in by_pool.items():
        want = (sy * 10**9) // n
        assert all(f == want for x, l, f in got if l == lo)


def test_isotonic_validates(spark):
    import pytest as _pt

    from loan_etl_data_pipeline_spark.operators.quality import isotonic_fit

    empty = spark.createDataFrame([], "x bigint, sy bigint, n bigint")
    with _pt.raises(ValueError, match="at least one"):
        isotonic_fit(empty, "x", "sy", "n")
    zero = spark.createDataFrame([(1, 1, 0)], ["x", "sy", "n"])
    with _pt.raises(ValueError, match="n > 0"):
        isotonic_fit(zero, "x", "sy", "n")
