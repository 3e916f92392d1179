"""Amortization fold (operators/finance.py).

The oracle-parity replica (tests/test_oracle_parity.py) certifies
q_amortization against the recursive-CTE oracle; these tests pin the
operator contract itself: the unrolled and HOF-fold paths are
bit-identical, payoff clamps at zero, and a hand-computed schedule
matches.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from loan_etl_data_pipeline_spark.operators.finance import amortize


def _loans(spark):
    rows = [
        # (id, principal cents, rate bp, payment cents)
        (1, 120_000, 100, 11_000),   # pays off before month 12
        (2, 120_000, 100, 1_000),    # negative amortization (balloon grows)
        (3, 0, 500, 1_000),          # zero principal: clamped at 0 all year
        (4, 55_000_000, 125, 5_270_833),  # max-scale order, no overflow
    ]
    return spark.createDataFrame(
        rows, "id long, principal_c long, rate_bp long, payment_c long"
    )


def _py_schedule(principal: int, rate_bp: int, payment: int, months: int):
    bal, intp = principal, 0
    for _ in range(months):
        step = (bal * rate_bp) // 10000
        intp += step
        bal = max(0, bal + step - payment)
    return bal, intp


def test_matches_python_reference(spark):
    out = {
        r["id"]: (r["final_balance_c"], r["interest_paid_c"])
        for r in amortize(
            _loans(spark), "principal_c", "rate_bp", "payment_c", 12
        ).collect()
    }
    for rid, principal, rate, pay in [
        (1, 120_000, 100, 11_000),
        (2, 120_000, 100, 1_000),
        (3, 0, 500, 1_000),
        (4, 55_000_000, 125, 5_270_833),
    ]:
        assert out[rid] == _py_schedule(principal, rate, pay, 12), rid


def test_payoff_clamps_at_zero(spark):
    out = amortize(
        _loans(spark).filter(F.col("id") == 1),
        "principal_c",
        "rate_bp",
        "payment_c",
        12,
    ).collect()[0]
    assert out["final_balance_c"] == 0
    # post-payoff months accrue 0 interest (0 * rate div 10000)
    bal, intp = _py_schedule(120_000, 100, 11_000, 12)
    assert out["interest_paid_c"] == intp


def test_all_three_paths_identical(spark):
    """Unrolled codegen, Arrow kernel, and SQL fold are bit-identical."""
    df = _loans(spark)
    key = lambda rows: sorted(  # noqa: E731
        tuple(None if v is None else v for v in r) for r in rows
    )
    unrolled = key(
        amortize(
            df, "principal_c", "rate_bp", "payment_c", 24,
            payoff_col="pm", unroll_threshold=60,
        ).collect()
    )
    arrow = key(
        amortize(
            df, "principal_c", "rate_bp", "payment_c", 24,
            payoff_col="pm", unroll_threshold=0, engine="arrow",
        ).collect()
    )
    sql = key(
        amortize(
            df, "principal_c", "rate_bp", "payment_c", 24,
            payoff_col="pm", unroll_threshold=0, engine="sql",
        ).collect()
    )
    assert unrolled == arrow == sql


def test_negative_rate_paths_identical(spark):
    """ADVICE r4: a negative rate_bp makes bal*rate negative, where
    numpy/Python `//` FLOOR but Spark `div` truncates toward zero — the
    kernels must implement truncating division so the bit-identical
    contract holds on any sign. Rows are chosen so floor != trunc
    (nonzero remainder on a negative product: 3·-5002 = -15006 →
    trunc -1, floor -2)."""
    rows = [
        (1, 3, -5002, 0),       # bal stays tiny, remainder nonzero
        (2, 1000, -15000, 0),   # payoff via negative interest
        (3, 99999, -1, 7),      # -99999/10000 → trunc -9, floor -10
        (4, None, -5002, 0),    # NULL principal through the rare path
    ]
    df = spark.createDataFrame(
        rows, "id long, principal_c long, rate_bp long, payment_c long"
    )
    key = lambda rows: sorted(  # noqa: E731
        tuple(None if v is None else v for v in r) for r in rows
    )
    outs = [
        key(
            amortize(
                df, "principal_c", "rate_bp", "payment_c", 3,
                payoff_col="pm", unroll_threshold=thr, engine=eng,
            ).collect()
        )
        for thr, eng in ((60, "auto"), (0, "arrow"), (0, "sql"))
    ]
    assert outs[0] == outs[1] == outs[2]
    # pin the truncating value itself, not just cross-path agreement:
    # id=1, month 1: step = trunc(-15006/10000) = -1 (floor would be -2)
    one = {
        r["id"]: (r["final_balance_c"], r["interest_paid_c"])
        for r in amortize(
            df, "principal_c", "rate_bp", "payment_c", 1,
            unroll_threshold=0, engine="arrow",
        ).collect()
    }
    assert one[1] == (2, -1)
    assert one[3] == (99983, -9)


def test_payoff_month_semantics(spark):
    out = {
        r["id"]: r["pm"]
        for r in amortize(
            _loans(spark), "principal_c", "rate_bp", "payment_c", 12,
            payoff_col="pm",
        ).collect()
    }
    # id 1 pays off (find the exact month in python), id 2 never does,
    # id 3 is zero-principal: first payment "retires" it at month 1
    bal, pm = 120_000, None
    for m in range(1, 13):
        step = (bal * 100) // 10000
        bal = max(0, bal + step - 11_000)
        if pm is None and bal == 0:
            pm = m
    assert out[1] == pm and pm is not None
    assert out[2] is None
    assert out[3] == 1


def test_long_term_plan_is_constant_size(spark):
    # long terms route through a bounded-size plan (Arrow kernel by
    # default, SQL fold under engine='sql'): the plan string must not
    # grow with the term.
    df = _loans(spark)
    for eng in ("arrow", "sql"):
        p360 = amortize(
            df, "principal_c", "rate_bp", "payment_c", 360, engine=eng
        )._jdf.queryExecution().optimizedPlan().toString()
        p120 = amortize(
            df, "principal_c", "rate_bp", "payment_c", 120, engine=eng
        )._jdf.queryExecution().optimizedPlan().toString()
        assert abs(len(p360) - len(p120)) < 50, eng  # only the literal differs


def test_zero_months_is_identity(spark):
    out = amortize(
        _loans(spark), "principal_c", "rate_bp", "payment_c", 0
    ).collect()
    for r in out:
        assert r["final_balance_c"] == r["principal_c"]
        assert r["interest_paid_c"] == 0


def test_null_inputs_identical_across_paths(spark):
    """NULL principal/rate/payment rows follow Spark expression-tree
    NULL semantics identically on all three paths (greatest(0, NULL)
    skips the NULL: balance clamps to 0, interest goes NULL)."""
    rows = [
        (1, None, 100, 11_000),
        (2, 120_000, None, 11_000),
        (3, 120_000, 100, None),
        (4, 120_000, 100, 11_000),
    ]
    df = spark.createDataFrame(
        rows, "id long, principal_c long, rate_bp long, payment_c long"
    )

    def got(**kw):
        return sorted(
            tuple(r)
            for r in amortize(
                df, "principal_c", "rate_bp", "payment_c", 24,
                payoff_col="pm", **kw,
            ).collect()
        )

    unrolled = got(unroll_threshold=60)
    arrow = got(unroll_threshold=0, engine="arrow")
    sql = got(unroll_threshold=0, engine="sql")
    assert unrolled == arrow == sql
    by_id = {r[0]: r for r in unrolled}
    assert by_id[1][5] is None  # NULL principal -> NULL interest
    assert by_id[1][4] == 0     # greatest(0, NULL) -> balance clamps 0


def test_output_column_collision_replaces_in_place(spark):
    """A colliding input column is REPLACED IN ITS POSITION (withColumn
    semantics) on every path — positional consumers (unions across
    engines, tuple comparisons) must see identical schemas."""
    import pyspark.sql.functions as F

    # collision as the FIRST column, where an append-at-end bug shows
    df = _loans(spark).select(
        F.lit(-1).cast("long").alias("final_balance_c"), "*"
    )
    cols_seen = []
    for kw in (
        {"unroll_threshold": 60},
        {"unroll_threshold": 0, "engine": "arrow"},
        {"unroll_threshold": 0, "engine": "sql"},
    ):
        out = amortize(df, "principal_c", "rate_bp", "payment_c", 12, **kw)
        assert out.columns.count("final_balance_c") == 1
        assert all(r["final_balance_c"] >= 0 for r in out.collect()), kw
        cols_seen.append(out.columns)
    assert cols_seen[0] == cols_seen[1] == cols_seen[2]


def test_null_batch_does_not_corrupt_large_siblings(spark):
    """A NULL row in a batch must not round-trip its non-null siblings
    through float64: values above 2^53 stay exact on the Arrow path."""
    big = 9_007_199_254_740_993  # 2^53 + 1: float64 cannot represent it
    df = spark.createDataFrame(
        [(1, big, 0, 0), (2, None, 100, 10)],
        "id long, principal_c long, rate_bp long, payment_c long",
    )
    out = {
        r["id"]: (r["final_balance_c"], r["interest_paid_c"])
        for r in amortize(
            df, "principal_c", "rate_bp", "payment_c", 70,
            unroll_threshold=60, engine="arrow",
        ).collect()
    }
    # rate 0, payment 0: balance must be EXACTLY the odd principal
    assert out[1] == (big, 0)
    assert out[2][1] is None  # the null row follows NULL semantics
