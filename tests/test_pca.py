"""power_iteration_topdir (operators/pca.py): planted-direction
recovery + determinism. The sf-scale cross-engine check is
q_power_iteration (generated unrolled-CTE oracle)."""

from __future__ import annotations

import math

import pytest

from loan_etl_data_pipeline_spark.operators.pca import power_iteration_topdir


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "id long, e array<float>")


def test_power_iteration_recovers_planted_direction(spark):
    # energy concentrated on dim 2; deterministic "noise" elsewhere
    rows = [
        (i, [0.01 * ((i * 7 + j) % 5 - 2) if j != 1 else 1.0 + 0.001 * i
             for j in range(8)])
        for i in range(40)
    ]
    v = {r["dim"]: r["v"] for r in
         power_iteration_topdir(_vecs(spark, rows), "id", "e", dim=8,
                                iters=3).collect()}
    norm = math.sqrt(sum(c * c for c in v.values()))
    # dominant mass on dim 2, positive under the all-ones start
    assert v[2] > 0 and v[2] / norm > 0.95


def test_power_iteration_deterministic(spark):
    rows = [(i, [float((i + j) % 3) - 1.0 for j in range(6)])
            for i in range(20)]
    df = _vecs(spark, rows)
    a = sorted((r["dim"], r["v"]) for r in
               power_iteration_topdir(df, "id", "e", dim=6, iters=2).collect())
    b = sorted((r["dim"], r["v"]) for r in
               power_iteration_topdir(df.repartition(7), "id", "e", dim=6,
                                      iters=2).collect())
    assert a == b  # partitioning cannot change a single component


def test_power_iteration_validates(spark):
    df = _vecs(spark, [(1, [1.0])])
    with pytest.raises(ValueError):
        power_iteration_topdir(df, "id", "e", dim=0, iters=3)
    with pytest.raises(ValueError):
        power_iteration_topdir(df, "id", "e", dim=1, iters=0)


def test_remove_common_direction_orthogonalizes(spark):
    from loan_etl_data_pipeline_spark.operators.pca import (
        power_iteration_topdir,
        remove_common_direction,
    )

    rows = [
        (i, [1.0 + 0.01 * i if j == 0 else 0.05 * ((i + j) % 3)
             for j in range(6)])
        for i in range(30)
    ]
    df = _vecs(spark, rows)
    vdir = power_iteration_topdir(df, "id", "e", dim=6, iters=3)
    v = {r["dim"]: r["v"] for r in vdir.collect()}
    corrected = remove_common_direction(df, "id", "e", vdir, dim=6)
    # residual projection of every corrected vector onto v is ~0
    # relative to the original projections (bounded by the staged
    # integer-division granularity: |residual| <= vv/1000 + |v|_1)
    import collections
    per_vec = collections.defaultdict(int)
    for r in corrected.collect():
        per_vec[r["id"]] += r["xq_corrected"] * v[r["j"]]
    vv = sum(c * c for c in v.values())
    bound = vv / 1000 + sum(abs(c) for c in v.values())
    for residual in per_vec.values():
        assert abs(residual) <= bound


def test_deflated_second_direction_is_distinct(spark):
    from loan_etl_data_pipeline_spark.operators.pca import (
        dominant_direction_of_quantized,
        power_iteration_topdir,
        remove_common_direction,
    )
    import pyspark.sql.functions as F
    import math

    # energy on dim 1 (strong) and dim 4 (weaker, independent)
    rows = [
        (i, [2.0 + 0.01 * i, 0.0, 0.0,
             (1.0 if i % 2 else -1.0) * (0.8 + 0.01 * i), 0.0, 0.0])
        for i in range(30)
    ]
    df = _vecs(spark, rows)
    v1df = power_iteration_topdir(df, "id", "e", dim=6, iters=4)
    corrected = remove_common_direction(df, "id", "e", v1df, dim=6)
    v2df = dominant_direction_of_quantized(
        corrected.select("id", "j", F.col("xq_corrected").alias("q")),
        dim=6, iters=4,
    )
    v1 = {r["dim"]: r["v"] for r in v1df.collect()}
    v2 = {r["dim"]: r["v"] for r in v2df.collect()}
    n1 = math.sqrt(sum(c * c for c in v1.values()))
    n2 = math.sqrt(sum(c * c for c in v2.values()))
    # v1 ~ dim 1, v2 ~ dim 4, near-orthogonal
    assert abs(v1[1]) / n1 > 0.9
    assert abs(v2[4]) / n2 > 0.9
    cos = sum(v1[j] * v2[j] for j in v1) / (n1 * n2)
    assert abs(cos) < 0.15
