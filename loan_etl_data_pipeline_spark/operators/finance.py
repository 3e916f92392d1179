"""Loan-finance recurrences: amortization schedules as row-local folds.

The reference is a *loan* ETL (its insight pass computes
``total_loans`` / ``avg_loan_amount`` / ``by_loan_type`` —
``airflow/dags/etl/pyspark_etl.py:38-46``) but never computes the one
thing every loan system eventually needs: the amortization schedule —
"given principal, rate and payment, what balance and cumulative
interest remain after N periods?". That is a *sequential* per-row
recurrence (each month's interest depends on the prior month's
balance), which naive ports express as a driver loop or a row-at-a-time
UDF. Here it is a compile-time-unrolled column expression: N chained
projections that Catalyst collapses into ONE whole-stage-codegen
Project — zero shuffle, zero Python, O(N) expression depth per row.

Exactness contract (what makes the DuckDB oracle value-hash possible):
all arithmetic is int64 cents / basis points:

    interest_m = (bal * rate_bp) div 10000          -- trunc toward zero
    bal'       = greatest(0, bal + interest_m - payment)

``div`` truncates toward zero exactly like DuckDB's ``//`` (verified on
negatives), and the numpy/Python kernels implement the same truncating
division explicitly (bare ``//`` FLOORS there), so N folded months
replicate bit-for-bit against a recursive CTE — for negative rates too.

100 TB story: the fold is row-local — it scales with the scan, no
shuffle, no per-key state. ``unroll_threshold`` bounds codegen size:
longer terms default to a vectorized Arrow kernel (one numpy pass per
month across all rows — measured ~29× faster than the interpreted SQL
``aggregate(sequence(...))`` fold at 360 months (bench min-of-two:
18.2 s → 0.63 s at sf0.1), which stays available
as ``engine='sql'`` for Python-worker-free deployments), so plan size
stays O(1) in the term length while short consumer-loan terms get the
fully-codegen unrolled form. All three paths are pinned bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def amortize(
    df: DataFrame,
    principal_c: str,
    rate_bp: str,
    payment_c: str,
    months: int,
    *,
    balance_col: str = "final_balance_c",
    interest_col: str = "interest_paid_c",
    payoff_col: str | None = None,
    unroll_threshold: int = 60,
    engine: str = "auto",
) -> DataFrame:
    """Fold ``months`` of the integer amortization recurrence per row.

    ``principal_c``/``payment_c`` are int64 cents columns, ``rate_bp``
    an int64 monthly rate in basis points. Appends ``balance_col``
    (balance after the last month, floored at 0) and ``interest_col``
    (cumulative interest accrued; months after payoff contribute 0 by
    construction since the balance is 0). With ``payoff_col`` set, also
    appends the 1-based month whose payment first brought the balance
    to 0 (NULL if the loan is still open after the last month) — the
    loan-book survival curve in one pass. Input columns are untouched.

    ``engine`` picks the long-term path (terms ≤ ``unroll_threshold``
    always take the unrolled codegen form): ``'auto'``/``'arrow'`` = a
    vectorized Arrow kernel (one numpy pass per month ACROSS all rows
    — measured ~29× faster than the interpreted SQL fold at 360
    months: 18.2 s → 0.63 s on 150 k loans at sf0.1); ``'sql'`` = the
    O(1)-plan-size ``aggregate(sequence())`` fold, pure-JVM but
    interpreted per element — the fallback where Python workers are
    unavailable. All three paths are bit-identical (pinned by
    tests/test_finance.py): every step is int64 division truncated
    toward zero — Spark ``div`` / DuckDB ``//`` semantics, replicated
    explicitly in the numpy/Python kernels (whose bare ``//`` floors),
    so the contract holds even for a negative ``rate_bp``.
    """
    if months < 0:
        raise ValueError(f"months must be >= 0, got {months}")
    if engine not in ("auto", "arrow", "sql"):
        raise ValueError(f"engine must be auto|arrow|sql, got {engine!r}")
    if months <= unroll_threshold:
        # Unrolled: a few columns per month, all collapsed by Catalyst
        # into one Project -> whole-stage codegen end to end.
        out = (
            df.withColumn("_am_bal", F.col(principal_c).cast("long"))
            .withColumn("_am_int", F.lit(0).cast("long"))
            .withColumn("_am_pm", F.lit(None).cast("long"))
        )
        for i in range(1, months + 1):
            out = (
                out.withColumn(
                    "_am_step", F.expr("(_am_bal * " + rate_bp + ") div 10000")
                )
                .withColumn("_am_int", F.expr("_am_int + _am_step"))
                .withColumn(
                    "_am_bal",
                    F.expr(
                        "greatest(0L, _am_bal + _am_step - " + payment_c + ")"
                    ),
                )
                .withColumn(
                    "_am_pm",
                    F.expr(
                        "CASE WHEN _am_pm IS NULL AND _am_bal = 0 "
                        f"THEN {i}L ELSE _am_pm END"
                    ),
                )
            )
        out = out.withColumn(balance_col, F.col("_am_bal")).withColumn(
            interest_col, F.col("_am_int")
        )
        if payoff_col is not None:
            out = out.withColumn(payoff_col, F.col("_am_pm"))
        return out.drop("_am_bal", "_am_int", "_am_pm", "_am_step")
    if engine in ("auto", "arrow"):
        # Vectorized kernel: the month loop runs 360 numpy passes over
        # ALL rows of a batch at once instead of interpreting ~8
        # expression nodes per row per month. Division truncates toward
        # zero to match Spark `div` on any sign. mapInArrow, NOT mapInPandas:
        # Arrow hands nullable int64 as values+validity, while the
        # pandas bridge converts a null-bearing long column to float64
        # and silently rounds EVERY value in the batch above 2^53.
        import numpy as np
        from collections.abc import Iterator

        new_cols = [balance_col, interest_col] + (
            [payoff_col] if payoff_col else []
        )
        # withColumn REPLACES a colliding input column IN PLACE in the
        # other two paths; mirror both membership and POSITION: output
        # order = input order (collisions replaced where they stand) +
        # genuinely new columns appended
        out_order = list(df.columns) + [c for c in new_cols if c not in df.columns]
        in_types = dict(df.dtypes)
        schema = ", ".join(
            f"`{c}` bigint" if c in new_cols else f"`{c}` {in_types[c]}"
            for c in out_order
        )

        def _null_row(p, r, pay):
            # Replicate the expression-tree NULL semantics of the
            # unrolled/SQL paths exactly: arithmetic propagates NULL,
            # greatest(0L, NULL) skips the NULL and returns 0.
            def mul(x, y):
                return None if x is None or y is None else x * y

            def add(x, y):
                return None if x is None or y is None else x + y

            def tdiv(x, d):
                # truncate toward zero = Spark `div` = DuckDB `//`;
                # Python's bare `//` FLOORS and would diverge on a
                # negative rate_bp (ADVICE r4)
                q = abs(x) // d
                return q if x >= 0 else -q

            bal, intp, pm = p, 0, None
            for m in range(1, months + 1):
                step = None if mul(bal, r) is None else tdiv(bal * r, 10000)
                intp = add(intp, step)
                nb = add(add(bal, step), None if pay is None else -pay)
                bal = 0 if nb is None else max(0, nb)
                if pm is None and bal == 0:
                    pm = m
            return bal, intp, pm

        def _kernel(batches):
            import pyarrow as pa
            import pyarrow.compute as pc

            for rb in batches:
                if rb.num_rows == 0:
                    continue
                names = rb.schema.names
                arrs = {c: rb.column(names.index(c)) for c in names}
                ins = [arrs[principal_c], arrs[rate_bp], arrs[payment_c]]
                # exact int64 values + separate validity — no float trip
                filled = [
                    a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
                    for a in ins
                ]
                nulls = np.zeros(rb.num_rows, dtype=bool)
                vals = []
                for a in filled:
                    nulls |= pc.is_null(a).to_numpy(zero_copy_only=False)
                    vals.append(
                        a.fill_null(0).to_numpy(zero_copy_only=False).astype(
                            np.int64, copy=True
                        )
                    )
                bal, rate, pay = vals
                bal[nulls] = 0
                rate[nulls] = 0
                pay[nulls] = 0
                intp = np.zeros(rb.num_rows, dtype=np.int64)
                pm = np.zeros(rb.num_rows, dtype=np.int64)  # 0 = not yet
                for m in range(1, months + 1):
                    # truncate toward zero (= Spark `div`), not numpy's
                    # flooring `//` — the paths must agree even when a
                    # negative rate_bp makes bal*rate negative (ADVICE r4)
                    prod = bal * rate
                    step = np.where(prod >= 0, prod // 10000, -((-prod) // 10000))
                    intp += step
                    bal = np.maximum(0, bal + step - pay)
                    pm = np.where((pm == 0) & (bal == 0), m, pm)
                bal_mask = np.zeros(rb.num_rows, dtype=bool)
                int_mask = np.zeros(rb.num_rows, dtype=bool)
                pm_mask = pm == 0
                if nulls.any():
                    # rare path: per-row scalar fold with Spark NULL
                    # semantics (the vectorized result for these rows
                    # is garbage-on-zeros and is overwritten here);
                    # .as_py() is an exact python int at any magnitude
                    for i in np.flatnonzero(nulls):
                        b, t, pmv = _null_row(
                            *[a[int(i)].as_py() for a in filled]
                        )
                        bal[i], bal_mask[i] = (0, True) if b is None else (b, False)
                        intp[i], int_mask[i] = (0, True) if t is None else (t, False)
                        pm[i], pm_mask[i] = (
                            (0, True) if pmv is None else (pmv, False)
                        )
                new_arrays = {
                    balance_col: pa.array(bal, mask=bal_mask),
                    interest_col: pa.array(intp, mask=int_mask),
                }
                if payoff_col:
                    new_arrays[payoff_col] = pa.array(pm, mask=pm_mask)
                out_arrays = [
                    new_arrays[c] if c in new_arrays else arrs[c]
                    for c in out_order
                ]
                yield pa.RecordBatch.from_arrays(out_arrays, names=out_order)

        return df.mapInArrow(_kernel, schema=schema)
    # engine='sql': one fold expression — O(1) plan size, identical
    # arithmetic, no Python workers needed, but interpreted per element.
    # SQL lambdas cannot let-bind, so the new-balance expression appears
    # more than once; runtime subexpression elimination evaluates it
    # once per step. pm uses 0 as "not yet" (struct fields can't start
    # NULL-typed inside aggregate's zero literal) and NULLs out at the
    # end. The intp zero is nullif(0L, <sentinel>) NOT a bare 0L: the
    # accumulator struct inherits the ZERO's nullability, and writing a
    # NULL lambda result into a non-nullable slot silently coerces to 0
    # (measured) — a bare-0L zero would make a NULL-principal loan
    # report 0 interest where the unrolled/Arrow paths report NULL.
    new_bal = (
        f"greatest(0L, acc.bal + (acc.bal * {rate_bp}) div 10000"
        f" - {payment_c})"
    )
    folded = F.expr(
        f"""
        aggregate(
          sequence(1, {months}),
          named_struct('bal', CAST({principal_c} AS BIGINT),
                       'intp', nullif(0L, 9223372036854775807L),
                       'pm', 0L),
          (acc, m) -> named_struct(
            'bal', {new_bal},
            'intp', acc.intp + (acc.bal * {rate_bp}) div 10000,
            'pm', CASE WHEN acc.pm > 0L THEN acc.pm
                       WHEN {new_bal} = 0L THEN CAST(m AS BIGINT)
                       ELSE 0L END),
          acc -> acc)
        """
    )
    out = (
        df.withColumn("_am_acc", folded)
        .withColumn(balance_col, F.col("_am_acc.bal"))
        .withColumn(interest_col, F.col("_am_acc.intp"))
    )
    if payoff_col is not None:
        out = out.withColumn(
            payoff_col,
            F.expr("CASE WHEN _am_acc.pm > 0L THEN _am_acc.pm END"),
        )
    return out.drop("_am_acc")
