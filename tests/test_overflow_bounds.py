"""Boundary fixtures for the documented int64 escape hatches
(VERDICT r5 "What's wrong #2": the decimal-ladder swaps were documented
but never exercised — the class of silent wrap the chi2 probe #12 once
caught in-plan).

Each test plants a synthetic fixture whose COMPOSITE product sits just
inside / just past 2^63 (adversarial magnitudes, not row counts — the
same arithmetic a 4·10⁸-row table would hit) and asserts the contract:

* inside the bound → engine output equals the DuckDB oracle on the
  same fixture, bit-exact (the decimal path narrows back to the
  historical bigint emission);
* past the bound → the plan raises LOUDLY (``_checked_bigint``'s
  in-plan raise_error), mirroring DuckDB's erroring BIGINT overflow,
  instead of Spark's silent non-ANSI wrap.
"""

from __future__ import annotations

import datetime

import duckdb
import pytest
from pyspark.sql import functions as F

from loan_etl_data_pipeline_spark.queries import all_oracles, all_queries

QUERIES = all_queries()
ORACLES = all_oracles()


def _oracle_rows(sql: str, tmp_path, tables):
    import os

    con = duckdb.connect()
    for t in tables:
        p = f"{tmp_path}/{t}.parquet"
        if os.path.isdir(p):  # Spark writes a directory of part files
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    res = con.execute(sql)
    cols = [d[0] for d in res.description]
    rows = res.fetchall()
    con.close()
    return cols, rows


def _run_engine(spark, name, tmp_path):
    df = QUERIES[name](spark, str(tmp_path))
    return df.columns, [tuple(r) for r in df.collect()]


def _assert_equal(spark, name, tmp_path, tables):
    ecols, erows = _run_engine(spark, name, tmp_path)
    ocols, orows = _oracle_rows(ORACLES[name], tmp_path, tables)
    order_e = sorted(range(len(ecols)), key=lambda i: ecols[i])
    order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
    assert sorted(ecols) == sorted(ocols)
    e = sorted(tuple(repr(r[i]) for i in order_e) for r in erows)
    o = sorted(tuple(repr(r[i]) for i in order_o) for r in orows)
    assert e == o, f"{name}: engine vs oracle mismatch on boundary fixture"


# --- q_cochran_armitage ----------------------------------------------------
# composite var_core = N*Σs² − (Σs)².  With n rows of score s each
# non-returned: var_core = n·n·s² − (n·s)² = 0... so plant two distinct
# scores: rows (s=K weight a) and (s=0 weight b) give
# var_core = (a+b)·a·K² − (a·K)² = a·b·K².  Pick K so a·b·K² straddles
# 2^63 with a handful of rows.


def _write_lineitem(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "l_linenumber bigint, l_returnflag string"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))


def test_cochran_armitage_exact_just_inside_int64(spark, tmp_path):
    # a=2, b=2, K=2^30: var_core = 4·2^60 = 2^62 < 2^63 — inside.
    k = 2**30
    rows = [(k, "R"), (k, "N"), (0, "R"), (0, "N")]
    _write_lineitem(spark, tmp_path, rows)
    _assert_equal(spark, "q_cochran_armitage", tmp_path, ["lineitem"])
    r = QUERIES["q_cochran_armitage"](spark, str(tmp_path)).collect()[0]
    assert r["var_core"] == 4 * k * k  # == 2^62, exact
    # t_num = N·Σsr − R·Σs = 4·K − 2·2K = 0 on this symmetric plant
    assert r["t_num"] == 0


def test_cochran_armitage_raises_loudly_past_int64(spark, tmp_path):
    # a=4, b=4, K=2^30: var_core = 16·2^60 = 2^64 > 2^63 — the old
    # int64 path wrapped silently; the checked path must raise.
    k = 2**30
    rows = [(k, "R")] * 2 + [(k, "N")] * 2 + [(0, "R")] * 2 + [(0, "N")] * 2
    _write_lineitem(spark, tmp_path, rows)
    with pytest.raises(Exception, match="(?i)int64|decimal|ladder|out_of_range|overflow"):
        QUERIES["q_cochran_armitage"](spark, str(tmp_path)).collect()
    # the oracle errs loudly on the same fixture too (DuckDB BIGINT
    # overflow) — neither engine can silently diverge
    with pytest.raises(Exception):
        _oracle_rows(
            ORACLES["q_cochran_armitage"], tmp_path, ["lineitem"]
        )


# --- q_cusum_changepoint ---------------------------------------------------
# composite n·S_t − t·T.  Two days of totalprice P each: at t=1 the
# statistic is 2·P·100 − 1·2·P·100 = 0; plant asymmetric days so the
# composite is big: day1 = P, day2 = tiny → n·S_1 − 1·T ≈ P·100.
# Magnitude is driven by P·100·n, so P near 2^61/100 crosses with n=2.


def _write_orders(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "o_orderdate date, o_totalprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))


def test_cusum_exact_just_inside_int64(spark, tmp_path):
    d1 = datetime.date(2024, 1, 1)
    d2 = datetime.date(2024, 1, 2)
    # cents1 = 2^61 exactly (2^61/100 is representable: 2^61 = 100·q + r
    # handled via floor), cents2 = 0-ish day → |n·S − t·T| ≈ 2^61 < 2^63
    p1 = float(2**61 // 100)  # floor-cents = 100·(2^61//100) ≤ 2^61
    rows = [(d1, p1), (d2, 1.0)]
    _write_orders(spark, tmp_path, rows)
    _assert_equal(spark, "q_cusum_changepoint", tmp_path, ["orders"])


def test_cusum_raises_loudly_past_int64(spark, tmp_path):
    d1 = datetime.date(2024, 1, 1)
    d2 = datetime.date(2024, 1, 2)
    # cents1 ≈ 2^63: n·S_1 − t·T = 2·c1 − (c1+c2) = c1 − c2 ≈ 2^63 — but
    # ALSO the interior t·T ≈ 2·2^63; the checked narrowing must raise.
    p1 = float(2**63 // 100 + 10**6)
    rows = [(d1, p1), (d2, 1.0)]
    _write_orders(spark, tmp_path, rows)
    with pytest.raises(Exception, match="(?i)int64|decimal|ladder|out_of_range|overflow"):
        QUERIES["q_cusum_changepoint"](spark, str(tmp_path)).collect()


# --- q_burstiness ----------------------------------------------------------
# composite Σc² per event type.  Many rows needed for big daily counts —
# instead plant many DAYS each with count c via few rows? c is a COUNT,
# so magnitude needs row volume; the reachable boundary locally is the
# decimal accumulation itself. We verify the checked path is exact on a
# normal fixture (parity vs oracle) and that the guard expression
# actually fires by planting the overflow one level up: many duplicate
# (type, day) rows is infeasible at 2^31.5 rows locally, so this case
# pins exactness + the shared guard's loudness is covered by the two
# families above (same _checked_bigint code path).


def test_burstiness_exact_on_boundary_style_fixture(spark, tmp_path):
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    eid = 0
    for day in range(3):
        for i in range((day + 1) * 7):  # counts 7, 14, 21
            rows.append(
                (
                    eid,
                    base + datetime.timedelta(days=day, seconds=i),
                    1,
                    "click",
                    1.0,
                )
            )
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    _assert_equal(spark, "q_burstiness", tmp_path, ["events"])


def test_checked_bigint_rejects_decimal38_null_overflow(spark):
    """The residual >1e38 decimal overflow nulls out in non-ANSI Spark;
    _checked_bigint must treat that null as a loud error, not pass it
    through."""
    from loan_etl_data_pipeline_spark.queries import _checked_bigint

    df = spark.sql(
        "SELECT cast(99999999999999999999 as decimal(38,0)) AS v"
    ).select(
        _checked_bigint(
            (
                # 1e20 * 1e20 = 1e40 > 10^38-1 → decimal overflow → null
                F.col("v") * F.col("v")
            ).cast("decimal(38,0)"),
            "test composite",
        ).alias("x")
    )
    with pytest.raises(Exception, match="(?i)int64|decimal|ladder|out_of_range|overflow"):
        df.collect()


def test_spark_div_quotient_wrap_is_guarded(spark):
    """Round-6 self-review finding: Spark's `div` silently WRAPS the
    int64 quotient even under ANSI mode, while DuckDB's `//` stays
    exact (then errs loudly on the BIGINT narrowing) — a silent
    cross-engine divergence class.  Pin the measured engine behavior
    (if a Spark upgrade fixes it, this tells us the q_cmh guard can
    simplify) and prove the q_cmh guard shape raises instead."""
    wrapped = spark.sql(
        "SELECT cast(2e19 as decimal(38,0)) div 2 AS q"
    ).collect()[0]["q"]
    assert wrapped != 10**19, (
        "Spark div no longer wraps — simplify the q_cmh quotient guard"
    )
    guard = (
        "SELECT CASE WHEN num <= (cast(9223372036854775807 as"
        " decimal(19,0)) + 1) * den - 1"
        " THEN cast(num div den as bigint)"
        " ELSE raise_error('guard: quotient exceeds int64') END AS q"
        " FROM (SELECT cast(2e19 as decimal(38,0)) AS num,"
        " cast(2 as bigint) AS den)"
    )
    with pytest.raises(Exception, match="quotient exceeds int64"):
        spark.sql(guard).collect()
    ok = guard.replace("cast(2e19 as decimal(38,0))",
                       "cast(4e18 as decimal(38,0))")
    assert spark.sql(ok).collect()[0]["q"] == 2 * 10**18


# ---------------------------------------------------------------------------
# Round-7 boundaries
# ---------------------------------------------------------------------------


def _write_orders_r7(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_orderdate date, o_totalprice double, "
        "o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))


def test_page_hinkley_exact_just_inside_int64(spark, tmp_path):
    """The PH path's i·xᵢ product at adversarial magnitude: day 2
    carries cents = 100·2^55 ≈ 3.6e18, so the i=2 product is ~7.2e18 —
    just inside 2^63.  Engine must equal the DuckDB oracle bit-exact
    AND the hand-computed truncating-division path."""
    big = 2.0**55  # totalprice whose floor-cents are exactly 100*2^55
    _write_orders_r7(spark, tmp_path, [
        (1, datetime.date(2024, 1, 1), 1.0, "1-URGENT"),
        (2, datetime.date(2024, 1, 2), big, "1-URGENT"),
        (3, datetime.date(2024, 1, 3), 1.0, "1-URGENT"),
    ])
    b = 100 * 2**55
    s2, s3 = 100 + b, 200 + b
    dev = [0, (2 * b - s2) // 2, (3 * 100 - s3) // 3]  # python //: all operands positive except dev3 numerator
    # dev3 numerator is negative: python // floors, engines truncate —
    # recompute with truncation to stay faithful
    n3 = 3 * 100 - s3
    dev[2] = -((-n3) // 3) if n3 < 0 else n3 // 3
    m = [dev[0], dev[0] + dev[1], dev[0] + dev[1] + dev[2]]
    expected_range = max(m) - min(m)
    ecols, erows = _run_engine(spark, "q_page_hinkley", tmp_path)
    row = dict(zip(ecols, erows[0]))
    assert row["ph_range"] == expected_range
    assert row["n_days"] == 3
    _assert_equal(spark, "q_page_hinkley", tmp_path, ["orders"])


def test_page_hinkley_raises_loudly_past_int64(spark, tmp_path):
    """Same magnitude at i=3: the 3·xᵢ product passes 2^63 and the
    ANSI plan must abort loudly, never wrap."""
    big = 2.0**55
    _write_orders_r7(spark, tmp_path, [
        (1, datetime.date(2024, 1, 1), 1.0, "1-URGENT"),
        (2, datetime.date(2024, 1, 2), 1.0, "1-URGENT"),
        (3, datetime.date(2024, 1, 3), big, "1-URGENT"),
    ])
    with pytest.raises(Exception, match="(?i)overflow|ARITHMETIC"):
        _run_engine(spark, "q_page_hinkley", tmp_path)


def test_kish_ess_exact_just_inside_limb_bound(spark, tmp_path):
    """Three orders of floor-cents 100·2^40 each: Σw² ≈ 3.63e28 sits
    just inside the limb emission's 2^95 ≈ 3.96e28 bound (the _dec19
    ladder carries what int64 could not — each w² ≈ 1.2e28 is already
    past 2^63).  Equal weights ⇒ ESS exactly 3.0, and the engine must
    equal the DuckDB oracle bit-exact."""
    big = 2.0**40  # floor-cents 100*2^40 = 25*2^42, exactly representable
    _write_orders_r7(spark, tmp_path, [
        (1, datetime.date(2024, 1, 1), big, "1-URGENT"),
        (2, datetime.date(2024, 1, 2), big, "1-URGENT"),
        (3, datetime.date(2024, 1, 3), big, "1-URGENT"),
    ])
    ecols, erows = _run_engine(spark, "q_kish_ess", tmp_path)
    row = dict(zip(ecols, erows[0]))
    assert (row["n"], row["ess"]) == (3, 3.0)
    _assert_equal(spark, "q_kish_ess", tmp_path, ["orders"])


def test_kish_ess_raises_loudly_past_limb_bound(spark, tmp_path):
    """ONE order of floor-cents 100·2^56 puts Σw² ≈ 5.2e37 past 2^95 —
    inside decimal(38,0), but Spark's div would silently WRAP the high
    limb (the §8 quotient-wrap gotcha).  The guarded _limb must abort
    loudly with the remediation pointer instead of emitting garbage."""
    big = 2.0**56
    _write_orders_r7(
        spark, tmp_path, [(1, datetime.date(2024, 1, 1), big, "1-URGENT")]
    )
    with pytest.raises(Exception, match="(?i)limb emission|USER_RAISED"):
        _run_engine(spark, "q_kish_ess", tmp_path)


def test_kish_ess_sum_overflows_loudly_past_decimal38(spark, tmp_path):
    """Two such orders additionally push Σw² past 10^38−1: the
    decimal(38,0) accumulator itself must abort loudly under ANSI —
    never a silent null."""
    big = 2.0**56
    _write_orders_r7(spark, tmp_path, [
        (1, datetime.date(2024, 1, 1), big, "1-URGENT"),
        (2, datetime.date(2024, 1, 2), big, "1-URGENT"),
    ])
    with pytest.raises(
        Exception,
        match="(?i)overflow|cannot be represented|ARITHMETIC|limb emission|USER_RAISED",
    ):
        _run_engine(spark, "q_kish_ess", tmp_path)
