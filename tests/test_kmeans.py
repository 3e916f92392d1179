"""kmeans_int (operators/kmeans.py): planted-cluster recovery,
partition invariance, empty-cluster rule. The sf-scale cross-engine
check is q_kmeans (generated unrolled-CTE oracle)."""

from __future__ import annotations

import pytest

from loan_etl_data_pipeline_spark.operators.kmeans import kmeans_int


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "id long, e array<float>")


def test_kmeans_recovers_planted_clusters(spark):
    # two tight blobs far apart; init ids 0 (blob A) and 1 (blob B)
    rows = [(0, [0.0, 0.0]), (1, [10.0, 10.0])]
    rows += [(i, [0.0 + 0.01 * i, 0.1]) for i in range(2, 12)]
    rows += [(i, [10.0 - 0.01 * i, 9.9]) for i in range(12, 22)]
    got = {r["id"]: r["cluster"] for r in
           kmeans_int(_vecs(spark, rows), "id", "e", dim=2, k=2,
                      iters=2).collect()}
    assert got[0] == 0 and all(got[i] == 0 for i in range(2, 12))
    assert got[1] == 1 and all(got[i] == 1 for i in range(12, 22))


def test_kmeans_partition_invariant(spark):
    rows = [(i, [float((i * 3 + j) % 7), float((i + 2 * j) % 5)])
            for i in range(25) for j in [0]]
    df = _vecs(spark, rows)
    a = sorted((r["id"], r["cluster"]) for r in
               kmeans_int(df, "id", "e", dim=2, k=3, iters=2).collect())
    b = sorted((r["id"], r["cluster"]) for r in
               kmeans_int(df.repartition(9), "id", "e", dim=2, k=3,
                          iters=2).collect())
    assert a == b


def test_kmeans_validates(spark):
    df = _vecs(spark, [(1, [1.0])])
    with pytest.raises(ValueError):
        kmeans_int(df, "id", "e", dim=1, k=5, iters=1)  # k > n rows
    with pytest.raises(ValueError):
        kmeans_int(df, "id", "e", dim=1, k=0, iters=1)


def test_farthest_first_picks_extremes(spark):
    from loan_etl_data_pipeline_spark.operators.kmeans import farthest_first

    # cluster near origin + two far outliers; traversal must pick the
    # outliers at pos 2 and 3 before any cluster member
    rows = [(i, [0.001 * i, 0.0]) for i in range(10)]
    rows += [(100, [50.0, 0.0]), (200, [0.0, -40.0])]
    out = {r["pos"]: (r["id"], r["radius"]) for r in
           farthest_first(_vecs(spark, rows), "id", "e", dim=2, k=4).collect()}
    assert out[1][0] == 0 and out[1][1] == 0  # min-id seed, radius 0
    assert out[2][0] == 100                    # farthest from seed
    assert out[3][0] == 200                    # farthest from {0, 100}
    assert out[2][1] > out[3][1] > out[4][1]  # radius curve decreases
    assert out[4][0] in range(1, 10)          # back to the cluster


def test_farthest_first_partition_invariant(spark):
    from loan_etl_data_pipeline_spark.operators.kmeans import farthest_first

    rows = [(i, [float((i * 5 + j * 3) % 11), float((i + j) % 7)])
            for i in range(20) for j in [0]]
    df = _vecs(spark, rows)
    a = sorted(tuple(r) for r in
               farthest_first(df, "id", "e", dim=2, k=5).collect())
    b = sorted(tuple(r) for r in
               farthest_first(df.repartition(7), "id", "e", dim=2,
                              k=5).collect())
    assert a == b
