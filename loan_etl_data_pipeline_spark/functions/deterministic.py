"""Deterministic, engine-portable aggregate expressions.

Floating-point aggregates are NOT reproducible by default: a double sum
differs in the last ulps with accumulation order (partitioning, AQE
coalescing, retry order), and double→DECIMAL casts round differently
across engines (Spark HALF_UP vs DuckDB half-even on shortest-repr half
boundaries — both verified failure modes). These helpers define the
engine-wide portable contract used by every money/quantity aggregate:

    sum(x)  ≡ sum over rows of floor(x*100) in exact int64, /100 at the end
    avg(x)  ≡ that exact sum divided (one double division) by count(x)

``x*100`` is one IEEE multiply — bit-identical everywhere — and floor is
tie-free, so per-row cents are the same integers in any engine; integer
addition is associative, so the total is independent of partitioning and
execution order. Each helper has a SQL twin that any ANSI engine
(DuckDB, Postgres, Trino) evaluates to the bit-identical double, which
is what makes the oracle value-hash comparison in CORRECTNESS possible.

Semantics note: this is the *floored-cents* sum — for data with more
than 2 meaningful decimal places it differs from the naive double sum by
up to n/100 absolute. That is the documented contract, not an
approximation error; pick the scale factor to match your precision.
"""

from __future__ import annotations

import pyspark.sql.functions as F


def dsum_sql(expr: str, *, scale: int = 100) -> str:
    """SQL for the order-independent, engine-identical sum of ``expr``."""
    return (
        f"CAST(SUM(CAST(FLOOR(({expr}) * {scale}) AS BIGINT)) AS DOUBLE) / {scale}"
    )


def davg_sql(expr: str, count_expr: str, *, scale: int = 100) -> str:
    """SQL for the deterministic mean: exact scaled sum / count, in double."""
    return f"{dsum_sql(expr, scale=scale)} / count({count_expr})"


def dsum(expr: str, alias: str, *, scale: int = 100):
    """Column: deterministic sum of a double expression (see module doc)."""
    return F.expr(dsum_sql(expr, scale=scale)).alias(alias)


def davg(expr: str, count_expr: str, alias: str, *, scale: int = 100):
    """Column: deterministic null-ignoring mean of a double expression."""
    return F.expr(davg_sql(expr, count_expr, scale=scale)).alias(alias)
