"""Exact heavy hitters with bounded memory: Misra–Gries propose,
exact verify.

``groupBy(col).count()`` shuffles EVERY distinct value — at 100 TB a
token/URL/user frequency query moves billions of group keys to find
the handful above threshold. The streaming-algorithms answer is a
two-phase plan:

1. **Propose** (one scan, zero shuffle): each partition runs a
   Misra–Gries summary of capacity k = ``safety``/``threshold``
   inside ``mapInPandas`` (Arrow batches, vectorized merge: add a
   batch's ``value_counts``, then subtract the (k+1)-th largest count
   and keep positives — the standard MG merge, same error bound).
   MG guarantees any value with LOCAL frequency > n_p/k survives;
   since a value with GLOBAL frequency ≥ threshold·n must exceed
   threshold·n_p on at least one partition (pigeonhole), the union of
   per-partition candidates is a SUPERSET of the true answer.
2. **Verify** (one scan + a candidate-only shuffle): exact counts for
   candidate values only — the filter keeps ≤ k·partitions values, so
   the shuffle is tiny — then keep ``count >= threshold * n``.

The result is EXACT (phase 1 can only over-propose, never miss), so
the operator oracle-checks against plain GROUP BY ... HAVING — while
scaling to cardinalities where the plain GROUP BY dies. Nulls are
ignored (a null can't be a meaningful heavy hitter; filter upstream
if you must count them).

Reference has no frequency analysis at all; this generalizes its
``value_counts``-style insights (`airflow/dags/etl/pyspark_etl.py:16`
computes per-column modes = the k=1 special case).
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def heavy_hitters(
    df: DataFrame,
    col: str,
    threshold: float,
    *,
    safety: float = 4.0,
) -> DataFrame:
    """All values of ``col`` with frequency ≥ ``threshold`` of non-null
    rows, with exact counts: (value, freq) — see module doc for the
    two-phase plan.

    ``safety`` (> 1) multiplies the MG capacity beyond the minimum
    1/threshold: a larger summary over-proposes fewer false candidates
    (smaller verify shuffle) at the cost of executor memory —
    k·(value + int64) per task, e.g. threshold 1e-4, safety 4 → 40k
    counters, a few MB.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    if safety < 1.0:
        raise ValueError(f"safety must be >= 1, got {safety}")
    k = max(1, math.ceil(safety / threshold))

    src = df.select(F.col(col).cast("string").alias("v")).filter(
        F.col("v").isNotNull()
    )
    out_schema = "v string, n bigint"

    def propose(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters = pd.Series(dtype="int64")
        n_rows = 0
        for pdf in batches:
            n_rows += len(pdf)
            counters = counters.add(pdf["v"].value_counts(), fill_value=0)
            if len(counters) > k:
                # MG merge: subtract the (k+1)-th largest from ALL and
                # keep positives. The subtraction is what bounds the
                # total discarded mass by n_p/(k+1) (≥ k+1 counters each
                # absorb `cut`); filtering without subtracting would let
                # repeated merges evict a true heavy hitter.
                cut = counters.nlargest(k + 1).iloc[-1]
                counters = counters - cut
                counters = counters[counters > 0]
        # candidates (null n) + one row carrying the partition row count
        yield pd.DataFrame(
            {"v": list(counters.index) + [None], "n": [None] * len(counters) + [n_rows]}
        )

    summary = src.mapInPandas(propose, schema=out_schema)
    parts = summary.collect()  # ≤ k·partitions + partitions rows, by construction
    total = sum(r["n"] for r in parts if r["v"] is None)
    cands = [r["v"] for r in parts if r["v"] is not None]
    if total == 0 or not cands:
        return src.sparkSession.createDataFrame([], f"{col} string, freq bigint")
    return (
        src.filter(F.col("v").isin(cands))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= F.lit(float(threshold)) * F.lit(total))
        .select(F.col("v").alias(col), "freq")
    )
