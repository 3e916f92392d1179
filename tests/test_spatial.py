"""Grid-blocked radius join (operators/spatial.py)."""

from __future__ import annotations

import random

from loan_etl_data_pipeline_spark.operators.spatial import grid_radius_join


def _brute(rows, r):
    out = set()
    for i, (ia, xa, ya) in enumerate(rows):
        for ib, xb, yb in rows[i + 1 :]:
            d2 = (xa - xb) ** 2 + (ya - yb) ** 2
            if d2 <= r * r:
                a, b = sorted((ia, ib))
                out.add((a, b, d2))
    return out


def _run(spark, rows, r):
    df = spark.createDataFrame(rows, "id long, x long, y long")
    return {
        (q["id_a"], q["id_b"], q["dist2"])
        for q in grid_radius_join(df, "id", "x", "y", radius=r).collect()
    }


def test_matches_bruteforce_including_negatives(spark):
    rng = random.Random(11)
    rows = [
        (i, rng.randrange(-500, 500), rng.randrange(-500, 500))
        for i in range(120)
    ]
    assert _run(spark, rows, 100) == _brute(rows, 100)


def test_cell_boundary_pairs_found_once(spark):
    # pairs straddling cell boundaries (incl. the truncation-div zero
    # cell) must appear exactly once
    rows = [
        (1, 99, 0), (2, 101, 0),      # boundary at 100
        (3, -1, 0), (4, 1, 0),        # zero-straddling cell
        (5, 199, 199), (6, 201, 201), # diagonal corner hop
    ]
    out = _run(spark, rows, 100)
    assert (1, 2, 4) in out
    assert (3, 4, 4) in out
    assert (5, 6, 8) in out
    assert len(out) == len(_brute(rows, 100))


def test_plan_has_no_cartesian(spark):
    df = spark.createDataFrame([(1, 0, 0)], "id long, x long, y long")
    p = (
        grid_radius_join(df, "id", "x", "y", radius=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def _dbscan_py(rows, eps, min_pts):
    """Reference DBSCAN with min-id cluster labels and min-label border
    attachment (the operator's pinned determinism)."""
    ids = [r[0] for r in rows]
    pos = {r[0]: (r[1], r[2]) for r in rows}
    nbrs = {
        i: {
            j
            for j in ids
            if j != i
            and (pos[i][0] - pos[j][0]) ** 2 + (pos[i][1] - pos[j][1]) ** 2
            <= eps * eps
        }
        for i in ids
    }
    core = {i for i in ids if len(nbrs[i]) + 1 >= min_pts}
    # components over core-core edges
    label = {i: i for i in core}
    changed = True
    while changed:
        changed = False
        for i in core:
            for j in nbrs[i] & core:
                m = min(label[i], label[j])
                if label[i] != m or label[j] != m:
                    label[i] = label[j] = m
                    changed = True
    out = {}
    for i in ids:
        if i in core:
            out[i] = (label[i], "core")
        else:
            cl = [label[j] for j in nbrs[i] & core]
            out[i] = (min(cl), "border") if cl else (None, "noise")
    return out


def test_dbscan_matches_reference(spark):
    rng = random.Random(5)
    # two dense blobs + sprinkled noise
    rows = (
        [(i, rng.randrange(0, 50), rng.randrange(0, 50)) for i in range(20)]
        + [(100 + i, rng.randrange(500, 550), rng.randrange(500, 550)) for i in range(20)]
        + [(200 + i, rng.randrange(0, 1000), rng.randrange(0, 1000)) for i in range(10)]
    )
    from loan_etl_data_pipeline_spark.operators.spatial import dbscan

    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = {
        r["id"]: (r["cluster"], r["role"])
        for r in dbscan(df, "id", "x", "y", eps=30, min_pts=4).collect()
    }
    assert got == _dbscan_py(rows, 30, 4)
    roles = {v[1] for v in got.values()}
    assert roles == {"core", "border", "noise"}  # the fixture has all three


def test_dbscan_dense_shortcut_identical(spark):
    """VERDICT r4 ask #6: the dense-cell path (occupancy-proved cores +
    clique-node CC) must be bit-identical to the point-graph path on
    hostile fixtures — percolated uniform mass, negative coordinates,
    cell-boundary stragglers."""
    from loan_etl_data_pipeline_spark.operators.spatial import dbscan

    rng = random.Random(11)
    fixtures = [
        # percolated: one dense uniform blob, everything core
        [(i, rng.randrange(0, 60), rng.randrange(0, 60)) for i in range(60)],
        # negative coordinates straddling the origin (floor-vs-trunc trap)
        [(i, rng.randrange(-80, 80), rng.randrange(-80, 80)) for i in range(50)],
        # sparse dust + one tight clump: border/noise heavy
        [(i, rng.randrange(0, 2000), rng.randrange(0, 2000)) for i in range(30)]
        + [(100 + i, 500 + (i % 5), 500 + (i // 5)) for i in range(10)],
        # adversarial boundaries: pairs at EXACTLY eps (dist² == eps²,
        # must join), coordinates on inner-cell multiples (s = 21 for
        # eps=30), and exact duplicate points under distinct ids
        [(1, 0, 0), (2, 30, 0), (3, 0, 30), (4, 21, 21), (5, 42, 0),
         (6, 21, 21), (7, 63, 63), (8, 63, 63), (9, 64, 63),
         (10, 200, 200)],
    ]
    for rows in fixtures:
        df = spark.createDataFrame(rows, "id long, x long, y long")
        fast = {
            r["id"]: (r["cluster"], r["role"])
            for r in dbscan(
                df, "id", "x", "y", eps=30, min_pts=4, dense_shortcut=True
            ).collect()
        }
        slow = {
            r["id"]: (r["cluster"], r["role"])
            for r in dbscan(
                df, "id", "x", "y", eps=30, min_pts=4, dense_shortcut=False
            ).collect()
        }
        assert fast == slow
        assert fast == _dbscan_py(rows, 30, 4)


def test_dbscan_null_coordinates_and_minpts_one_identical(spark):
    """Review r5: NULL-coordinate points are eps-neighbors of nobody —
    core iff min_pts <= 1 (cluster = own id), noise otherwise; the
    dense path must NOT silently drop them through its cell equi-join.
    min_pts=1 also makes every real point core (self-neighborhood)."""
    from loan_etl_data_pipeline_spark.operators.spatial import dbscan

    rows = [(1, 0, 0), (2, 1, 0), (3, None, 5), (4, 7, None),
            (5, None, None), (6, 200, 200)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    for mp, expect_null_role in ((1, "core"), (3, "noise")):
        fast = {
            r["id"]: (r["cluster"], r["role"])
            for r in dbscan(
                df, "id", "x", "y", eps=2, min_pts=mp, dense_shortcut=True
            ).collect()
        }
        slow = {
            r["id"]: (r["cluster"], r["role"])
            for r in dbscan(
                df, "id", "x", "y", eps=2, min_pts=mp, dense_shortcut=False
            ).collect()
        }
        assert fast == slow, (mp, fast, slow)
        assert len(fast) == 6  # every input point present on both paths
        assert fast[3][1] == expect_null_role
        assert fast[5][1] == expect_null_role


def test_dbscan_dense_shortcut_small_eps_falls_back(spark):
    """eps=1 makes the inner cell side 0 — the operator must fall back
    to the point-graph path rather than divide by zero; eps <= 0 must
    raise on BOTH paths (the validation boundary is part of the
    identical-behavior contract)."""
    import pytest as _pytest

    from loan_etl_data_pipeline_spark.operators.spatial import dbscan

    rows = [(1, 0, 0), (2, 1, 0), (3, 0, 1), (4, 5, 5)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = {
        r["id"]: (r["cluster"], r["role"])
        for r in dbscan(df, "id", "x", "y", eps=1, min_pts=3).collect()
    }
    assert got == _dbscan_py(rows, 1, 3)
    for flag in (True, False):
        with _pytest.raises(ValueError):
            dbscan(df, "id", "x", "y", eps=-30, min_pts=3, dense_shortcut=flag)
        with _pytest.raises(ValueError):
            dbscan(df, "id", "x", "y", eps=0, min_pts=3, dense_shortcut=flag)
