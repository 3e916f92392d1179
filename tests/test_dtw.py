"""DTW kernel (operators/windows.py dtw_distance).

Oracle parity for q_dtw_shape certifies the end-to-end query; these pin
the kernel semantics: zero on identical series, phase-shift tolerance
(the reason to use DTW at all), and agreement with a brute-force DP.
"""

from __future__ import annotations

from loan_etl_data_pipeline_spark.operators.windows import dtw_distance


def _dtw_py(a, b):
    n, m = len(a), len(b)
    d = {}
    for i in range(n):
        for j in range(m):
            c = abs(a[i] - b[j])
            if i == 0 and j == 0:
                d[i, j] = c
            elif i == 0:
                d[i, j] = c + d[i, j - 1]
            elif j == 0:
                d[i, j] = c + d[i - 1, j]
            else:
                d[i, j] = c + min(d[i - 1, j], d[i, j - 1], d[i - 1, j - 1])
    return d[n - 1, m - 1]


def _run(spark, rows):
    df = spark.createDataFrame(
        rows, "k bigint, a array<bigint>, b array<bigint>"
    )
    return {
        r["k"]: r["dtw_dist"]
        for r in dtw_distance(df, "k", "a", "b").collect()
    }


def test_identical_series_is_zero(spark):
    s = list(range(1, 13))
    assert _run(spark, [(1, s, s)]) == {1: 0}


def test_phase_shift_cheaper_than_pointwise(spark):
    # a spike at month 5 vs the same spike at month 6: pointwise L1
    # pays 2*spike, DTW aligns and pays ~0
    a = [0] * 12
    b = [0] * 12
    a[4] = 1000
    b[5] = 1000
    out = _run(spark, [(1, a, b)])
    l1 = sum(abs(x - y) for x, y in zip(a, b))
    assert out[1] < l1
    assert out[1] == _dtw_py(a, b)


def test_matches_bruteforce_dp(spark):
    import random

    rng = random.Random(7)
    rows = [
        (k, [rng.randrange(0, 500) for _ in range(12)],
         [rng.randrange(0, 500) for _ in range(12)])
        for k in range(6)
    ]
    out = _run(spark, rows)
    for k, a, b in rows:
        assert out[k] == _dtw_py(a, b), k


def test_empty_or_null_series_yield_null(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, [1, 2], [1, 2]), (2, [], [1, 2]), (3, [1, 2], [])],
        "k long, a array<bigint>, b array<bigint>",
    ).union(
        spark.createDataFrame([(4,)], "k long").select(
            "k",
            F.lit(None).cast("array<bigint>").alias("a"),
            F.lit(None).cast("array<bigint>").alias("b"),
        )
    )
    out = {r["k"]: r["dtw_dist"] for r in dtw_distance(df, "k", "a", "b").collect()}
    assert out == {1: 0, 2: None, 3: None, 4: None}
