"""SCD type-2 operators: history build, incremental merge (the
merge(build(h1), h2) == build(h1 + h2) property), and point-in-time
join boundary semantics."""

from __future__ import annotations

import pyspark.sql.functions as F

from loan_etl_data_pipeline_spark.operators.scd import (
    point_in_time_join,
    scd2_from_history,
    scd2_merge,
)

SCHEMA = "k string, status string, seq long"


def _dim_rows(dim):
    rows = [
        (r["k"], r["status"], r["valid_from"], r["valid_to"], r["version"], r["is_current"])
        for r in dim.collect()
    ]
    return sorted(rows, key=lambda t: (t[0], t[4]))


def test_from_history_suppresses_noops_and_versions(spark):
    df = spark.createDataFrame(
        [
            ("a", "new", 1),
            ("a", "new", 3),      # no-op → collapsed
            ("a", "active", 5),
            ("a", "closed", 9),
            ("b", "new", 2),
        ],
        SCHEMA,
    )
    got = _dim_rows(scd2_from_history(df, "k", "status", "seq"))
    assert got == [
        ("a", "new", 1, 5, 1, False),
        ("a", "active", 5, 9, 2, False),
        ("a", "closed", 9, None, 3, True),
        ("b", "new", 2, None, 1, True),
    ]


def test_from_history_null_attr_transitions(spark):
    df = spark.createDataFrame(
        [("a", None, 1), ("a", None, 2), ("a", "x", 3), ("a", None, 4)], SCHEMA
    )
    got = _dim_rows(scd2_from_history(df, "k", "status", "seq"))
    # null→null is a no-op (null-safe compare); null→x→null are changes
    assert [(s, vf, vt) for _, s, vf, vt, _, _ in got] == [
        (None, 1, 3),
        ("x", 3, 4),
        (None, 4, None),
    ]


def test_merge_equals_full_rebuild(spark):
    h1 = [
        ("a", "new", 1),
        ("a", "active", 4),
        ("b", "new", 2),
        ("c", "new", 3),
    ]
    h2 = [
        ("a", "closed", 10),     # real change
        ("b", "new", 11),        # no-op vs current → suppressed
        ("c", "hold", 12),
        ("c", "closed", 13),     # two changes in one batch
        ("d", "new", 14),        # brand-new key
        ("d", "new", 15),        # in-batch no-op
    ]
    dim1 = scd2_from_history(spark.createDataFrame(h1, SCHEMA), "k", "status", "seq")
    merged = scd2_merge(
        dim1, spark.createDataFrame(h2, SCHEMA), "k", "status", "seq"
    )
    rebuilt = scd2_from_history(
        spark.createDataFrame(h1 + h2, SCHEMA), "k", "status", "seq"
    )
    assert _dim_rows(merged) == _dim_rows(rebuilt)
    # spot-check the interesting rows
    got = {(r["k"], r["version"]): r for r in merged.collect()}
    assert got[("a", 2)]["valid_to"] == 10 and not got[("a", 2)]["is_current"]
    assert got[("a", 3)]["status"] == "closed" and got[("a", 3)]["is_current"]
    assert ("b", 2) not in got                      # suppressed no-op
    assert got[("d", 1)]["valid_from"] == 14 and got[("d", 1)]["is_current"]


def test_merge_untouched_keys_pass_through_unchanged(spark):
    h1 = [("a", "new", 1), ("b", "new", 2)]
    dim1 = scd2_from_history(spark.createDataFrame(h1, SCHEMA), "k", "status", "seq")
    merged = scd2_merge(
        dim1,
        spark.createDataFrame([("a", "closed", 5)], SCHEMA),
        "k",
        "status",
        "seq",
    )
    b_rows = [r for r in merged.collect() if r["k"] == "b"]
    assert len(b_rows) == 1 and b_rows[0]["is_current"] and b_rows[0]["version"] == 1


def test_point_in_time_join_boundaries(spark):
    dim = scd2_from_history(
        spark.createDataFrame(
            [("a", "v1", 10), ("a", "v2", 20)], SCHEMA
        ),
        "k",
        "status",
        "seq",
    )
    facts = spark.createDataFrame(
        [(1, "a", 5), (2, "a", 10), (3, "a", 19), (4, "a", 20), (5, "a", 99)],
        "fid long, k string, t long",
    )
    got = {
        r["fid"]: (r["status"], r["version"])
        for r in point_in_time_join(facts, dim, "k", "t").collect()
    }
    assert got[1] == (None, None)          # before first version
    assert got[2] == ("v1", 1)             # inclusive valid_from
    assert got[3] == ("v1", 1)
    assert got[4] == ("v2", 2)             # change instant sees NEW version
    assert got[5] == ("v2", 2)             # open current version
    inner = point_in_time_join(facts, dim, "k", "t", how="inner")
    assert sorted(r["fid"] for r in inner.collect()) == [2, 3, 4, 5]


def test_from_history_tiebreak_total_order(spark):
    df = spark.createDataFrame(
        [("a", "x", 5, 2), ("a", "y", 5, 1), ("a", "x", 9, 3)],
        "k string, status string, seq long, eid long",
    )
    got = _dim_rows(
        scd2_from_history(df, "k", "status", "seq", tiebreak_cols="eid")
    )
    # eid orders the tie: y (eid 1) then x (eid 2) — y is a zero-length
    # version, x survives until 9... where x repeats → suppressed, so
    # x stays current from seq 5
    assert got == [
        ("a", "y", 5, 5, 1, False),
        ("a", "x", 5, None, 2, True),
    ]


def test_bitemporal_snapshot_belief_revision(spark):
    """A late-recorded retroactive correction changes the belief about
    an EARLIER valid time only once it is known."""
    import pyspark.sql.functions as F

    from loan_etl_data_pipeline_spark.operators.scd import bitemporal_snapshot

    rows = [
        # (key, valid_from, txn, value)
        (1, "2024-01-01 00:00:00", 10, 100),
        (1, "2024-01-05 00:00:00", 20, 200),
        # recorded later (txn 30) but retroactively valid Jan 3:
        (1, "2024-01-03 00:00:00", 30, 150),
        (2, "2024-01-02 00:00:00", 15, 900),
    ]
    df = spark.createDataFrame(
        rows, "k long, vf string, txn long, val long"
    ).withColumn("vf", F.col("vf").cast("timestamp_ntz"))
    v = F.lit("2024-01-04 00:00:00").cast("timestamp_ntz")

    def snap(bound):
        return {
            r["k"]: r["val"]
            for r in bitemporal_snapshot(
                df, "k", "vf", "txn", "val", valid_time=v, txn_bound=F.lit(bound)
            ).collect()
        }

    # as known at txn 20: Jan-4 belief for key 1 is the Jan-1 row
    assert snap(20) == {1: 100, 2: 900}
    # once the retroactive txn 30 is known, the Jan-4 belief revises
    assert snap(30) == {1: 150, 2: 900}
    # ties on valid_from: the later-recorded correction wins
    df2 = spark.createDataFrame(
        [(3, "2024-01-01 00:00:00", 1, 5), (3, "2024-01-01 00:00:00", 2, 7)],
        "k long, vf string, txn long, val long",
    ).withColumn("vf", F.col("vf").cast("timestamp_ntz"))
    out = bitemporal_snapshot(
        df2, "k", "vf", "txn", "val", valid_time=v, txn_bound=F.lit(99)
    ).collect()
    assert out[0]["val"] == 7
