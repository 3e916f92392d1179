"""Versioned snapshot tables (sources/versioned.py): commit protocol,
time travel, orphan invisibility, pruning."""

from __future__ import annotations

import os

import pytest

from loan_etl_data_pipeline_spark.sources.versioned import (
    list_versions,
    prune_versions,
    read_version,
    write_version,
)


@pytest.fixture()
def table_dir(tmp_path):
    return str(tmp_path / "tbl")


def test_snapshots_are_immutable_time_travel(spark, table_dir):
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    df2 = spark.createDataFrame([(1, "a"), (2, "B"), (3, "c")], "id long, v string")
    assert write_version(df1, table_dir) == 1
    assert write_version(df2, table_dir) == 2
    assert list_versions(spark, table_dir) == [1, 2]
    # latest == v2, explicit v1 still reads the ORIGINAL rows
    assert read_version(spark, table_dir).count() == 3
    old = {(r["id"], r["v"]) for r in read_version(spark, table_dir, 1).collect()}
    assert old == {(1, "a"), (2, "b")}


def test_uncommitted_orphan_is_invisible(spark, table_dir):
    df = spark.createDataFrame([(1,)], "id long")
    write_version(df, table_dir)
    # simulate a crashed writer: data dir exists, no manifest
    df.write.parquet(f"{table_dir}/v00000099")
    assert list_versions(spark, table_dir) == [1]
    assert read_version(spark, table_dir).count() == 1
    with pytest.raises(ValueError, match="not committed"):
        read_version(spark, table_dir, 99)


def test_read_empty_table_raises(spark, table_dir):
    with pytest.raises(ValueError, match="no committed versions"):
        read_version(spark, table_dir)


def test_prune_keeps_newest(spark, table_dir):
    for i in range(4):
        write_version(spark.createDataFrame([(i,)], "id long"), table_dir)
    dropped = prune_versions(spark, table_dir, keep_last=2)
    assert dropped == [1, 2]
    assert list_versions(spark, table_dir) == [3, 4]
    assert not os.path.exists(f"{table_dir}/v00000001")
    # next write continues the sequence
    assert write_version(spark.createDataFrame([(9,)], "id long"), table_dir) == 5
    with pytest.raises(ValueError):
        prune_versions(spark, table_dir, keep_last=0)


def test_orphan_is_reclaimed_by_next_writer(spark, table_dir):
    """A crash between data write and manifest commit must not wedge the
    table: the next writer reclaims the orphan directory."""
    write_version(spark.createDataFrame([(1,)], "id long"), table_dir)
    # crashed writer: v2 data exists, no manifest
    spark.createDataFrame([(99,)], "id long").write.parquet(f"{table_dir}/v00000002")
    v = write_version(spark.createDataFrame([(2,), (3,)], "id long"), table_dir)
    assert v == 2
    assert {r["id"] for r in read_version(spark, table_dir, 2).collect()} == {2, 3}


def test_stream_to_versioned_exactly_once(spark, tmp_path):
    """Each micro-batch commits one snapshot; restarting the drained
    stream commits nothing new; a simulated foreachBatch replay of an
    already-committed batch_id is skipped."""
    import json as _json

    from loan_etl_data_pipeline_spark.sources.versioned import version_manifests
    from loan_etl_data_pipeline_spark.streaming.ingest import stream_to_versioned

    src = tmp_path / "src"
    src.mkdir()
    tbl = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    (src / "a.json").write_text('{"id": 1}\n{"id": 2}\n')

    stream = spark.readStream.schema("id long").json(str(src))
    q = stream_to_versioned(stream, tbl, checkpoint_dir=ckpt)
    q.awaitTermination(60)
    assert list_versions(spark, tbl) == [1]
    assert {r["id"] for r in read_version(spark, tbl, 1).collect()} == {1, 2}
    manifests = version_manifests(spark, tbl)
    assert manifests[1]["batch_id"] == 0

    # restart with no new data: nothing commits
    q = stream_to_versioned(
        spark.readStream.schema("id long").json(str(src)), tbl, checkpoint_dir=ckpt
    )
    q.awaitTermination(60)
    assert list_versions(spark, tbl) == [1]

    # new file -> next batch -> snapshot 2
    (src / "b.json").write_text('{"id": 3}\n')
    q = stream_to_versioned(
        spark.readStream.schema("id long").json(str(src)), tbl, checkpoint_dir=ckpt
    )
    q.awaitTermination(60)
    assert list_versions(spark, tbl) == [1, 2]
    assert {r["id"] for r in read_version(spark, tbl).collect()} == {3}
    assert version_manifests(spark, tbl)[2]["batch_id"] == 1

    # the replay-skip branch itself: re-delivering an already-committed
    # (run, batch_id) must be a no-op...
    from loan_etl_data_pipeline_spark.streaming.ingest import _commit_versioned_batch

    from loan_etl_data_pipeline_spark.streaming.ingest import (
        _canonical_checkpoint_id,
    )

    # manifests record the CANONICAL checkpoint id, so a replay presented
    # under any spelling of the same checkpoint must still be skipped
    run_id = _canonical_checkpoint_id(spark, ckpt + "/")
    replay = spark.createDataFrame([(3,)], "id long")
    assert _commit_versioned_batch(replay, 1, tbl, run_id) is None
    assert list_versions(spark, tbl) == [1, 2]
    # ...while the same batch_id from a DIFFERENT checkpoint generation
    # (rebuilt checkpoint / second stream) must COMMIT, not be dropped
    assert _commit_versioned_batch(replay, 1, tbl, run_id + "_gen2") == 3
    assert list_versions(spark, tbl) == [1, 2, 3]


def test_diff_versions(spark, table_dir):
    from loan_etl_data_pipeline_spark.sources.versioned import diff_versions

    write_version(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"), table_dir
    )
    write_version(
        spark.createDataFrame([(2, "B"), (3, "c")], "id long, v string"), table_dir
    )
    got = {
        r["id"]: (r["change_type"], r["changed_cols"])
        for r in diff_versions(spark, table_dir, "id", old_version=1).collect()
    }
    assert got == {1: ("removed", ""), 2: ("changed", "v"), 3: ("added", "")}


def test_concurrent_manifest_detected_on_local_fs(spark, table_dir, monkeypatch):
    """POSIX rename(2) silently replaces an existing target, so the
    rename-returns-false guard never fires on RawLocalFileSystem; the
    explicit exists() probe must catch the lost race instead of letting
    a second writer overwrite the first writer's manifest.

    The race window is between the writer's version listing and its
    rename — simulated by pinning a stale listing while the rival's
    manifest lands."""
    from loan_etl_data_pipeline_spark.sources import versioned as V

    write_version(spark.createDataFrame([(1,)], "id long"), table_dir)
    monkeypatch.setattr(V, "list_versions", lambda *_a, **_k: [1])
    # rival writer commits version 2 between our (stale) list and rename
    with open(f"{table_dir}/_versions/00000002.json", "w") as f:
        f.write('{"version": 2, "data_dir": "v00000002"}')
    with pytest.raises(RuntimeError, match="single-writer"):
        V.write_version(spark.createDataFrame([(2,)], "id long"), table_dir)
    # the rival's manifest survives untouched; the loser's tmp is cleaned
    with open(f"{table_dir}/_versions/00000002.json") as f:
        assert '"data_dir": "v00000002"' in f.read()
    assert not os.path.exists(f"{table_dir}/_versions/00000002.json.tmp")


def test_canonical_checkpoint_id_spellings(spark, tmp_path):
    """Trailing slash / file:// scheme / bare absolute path are the SAME
    checkpoint — the exactly-once dedup key must not depend on spelling."""
    from loan_etl_data_pipeline_spark.streaming.ingest import (
        _canonical_checkpoint_id,
    )

    base = str(tmp_path / "ckpt")
    spellings = [base, base + "/", f"file://{base}", f"file://{base}/"]
    ids = {_canonical_checkpoint_id(spark, s) for s in spellings}
    assert len(ids) == 1, ids


def test_rollback_restores_as_new_version(spark, table_dir):
    from loan_etl_data_pipeline_spark.sources.versioned import (
        rollback_to,
        version_manifests,
    )

    write_version(spark.createDataFrame([(1, "good")], "id long, v string"), table_dir)
    write_version(spark.createDataFrame([(2, "bad")], "id long, v string"), table_dir)
    assert rollback_to(spark, table_dir, 1) == 3
    # latest now reads the v1 rows; the bad v2 stays queryable
    assert {(r["id"], r["v"]) for r in read_version(spark, table_dir).collect()} == {
        (1, "good")
    }
    assert {r["id"] for r in read_version(spark, table_dir, 2).collect()} == {2}
    assert version_manifests(spark, table_dir)[3]["rollback_of"] == 1
    with pytest.raises(ValueError, match="not committed"):
        rollback_to(spark, table_dir, 99)


def test_vacuum_reclaims_only_old_orphans(spark, table_dir):
    from loan_etl_data_pipeline_spark.sources.versioned import vacuum_orphans

    write_version(spark.createDataFrame([(1,)], "id long"), table_dir)
    # two crashed writers' leftovers + one committed version
    spark.createDataFrame([(98,)], "id long").write.parquet(f"{table_dir}/v00000098")
    spark.createDataFrame([(99,)], "id long").write.parquet(f"{table_dir}/v00000099")
    # fresh orphans survive a retention-window vacuum (in-flight writer
    # protection) ...
    assert vacuum_orphans(spark, table_dir, min_age_seconds=3600) == []
    assert os.path.exists(f"{table_dir}/v00000098")
    # ... and are reclaimed once older than the window
    assert vacuum_orphans(spark, table_dir, min_age_seconds=0) == [98, 99]
    assert not os.path.exists(f"{table_dir}/v00000098")
    assert not os.path.exists(f"{table_dir}/v00000099")
    # committed data untouched, table still reads
    assert list_versions(spark, table_dir) == [1]
    assert read_version(spark, table_dir).count() == 1
    # non-version dirs (manifests) never touched, idempotent re-run
    assert vacuum_orphans(spark, table_dir, min_age_seconds=0) == []
    assert vacuum_orphans(spark, f"{table_dir}/_nonexistent") == []


def test_forget_head_delete_with_audit(spark, tmp_path):
    from loan_etl_data_pipeline_spark.sources.versioned import (
        forget,
        list_versions,
        read_version,
        version_manifests,
    )

    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, f"u{i}") for i in range(10)], ["user_id", "name"]
    )
    write_version(df, t)
    keys = spark.createDataFrame([(3,), (7,), (99,)], ["id"])
    v = forget(spark, t, keys, "user_id")
    assert v == 2
    got = {r["user_id"] for r in read_version(spark, t).collect()}
    assert got == set(range(10)) - {3, 7}
    # audit trail in the manifest; absent key 99 forgets nothing
    m = version_manifests(spark, t)[2]
    assert m["forget"] == {"key_col": "user_id", "n_forgotten": 2}
    # WITHOUT purge: time travel still resurrects (the documented trap)
    assert read_version(spark, t, 1).count() == 10
    assert list_versions(spark, t) == [1, 2]


def test_forget_purge_history_is_physical(spark, tmp_path):
    from loan_etl_data_pipeline_spark.sources.versioned import (
        forget,
        list_versions,
        read_version,
    )

    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, f"u{i}") for i in range(6)], ["user_id", "name"]
    )
    write_version(df, t)
    keys = spark.createDataFrame([(0,), (1,)], ["user_id"])
    forget(spark, t, keys, "user_id", purge_history=True)
    assert list_versions(spark, t) == [2]  # history physically gone
    assert read_version(spark, t).count() == 4


def test_forget_rejects_unknown_key_col(spark, tmp_path):
    from loan_etl_data_pipeline_spark.sources.versioned import forget

    t = str(tmp_path / "tbl")
    write_version(spark.createDataFrame([(1,)], ["a"]), t)
    with pytest.raises(ValueError):
        forget(spark, t, spark.createDataFrame([(1,)], ["a"]), "nope")


def test_streaming_fingerprint_matches_one_shot(spark, tmp_path):
    """The maintained fingerprint after N micro-batches must equal the
    one-shot batch fingerprint of everything ingested; replays must not
    double-add; each version is the integrity state as-of its batch."""
    import pyspark.sql.functions as F

    from loan_etl_data_pipeline_spark.operators.quality import (
        table_fingerprint,
    )
    from loan_etl_data_pipeline_spark.sources.versioned import (
        list_versions,
        read_version,
    )
    from loan_etl_data_pipeline_spark.streaming.ingest import (
        streaming_fingerprint,
    )

    src = tmp_path / "src"
    src.mkdir()
    tbl = str(tmp_path / "fp")
    ckpt = str(tmp_path / "ckpt")
    (src / "a.json").write_text('{"id": 1, "v": "x"}\n{"id": 2, "v": "y"}\n')

    canonical = F.concat_ws("|", F.col("id").cast("string"), F.col("v"))
    stream = spark.readStream.schema("id long, v string").json(str(src))
    q = streaming_fingerprint(stream, canonical, tbl, checkpoint_dir=ckpt)
    q.awaitTermination(60)
    assert list_versions(spark, tbl) == [1]

    (src / "b.json").write_text('{"id": 3, "v": "z"}\n')
    q = streaming_fingerprint(
        spark.readStream.schema("id long, v string").json(str(src)),
        canonical,
        tbl,
        checkpoint_dir=ckpt,
    )
    q.awaitTermination(60)
    assert list_versions(spark, tbl) == [1, 2]

    # restart with nothing new: no version, no double-add
    q = streaming_fingerprint(
        spark.readStream.schema("id long, v string").json(str(src)),
        canonical,
        tbl,
        checkpoint_dir=ckpt,
    )
    q.awaitTermination(60)
    assert list_versions(spark, tbl) == [1, 2]

    maintained = {
        r.bucket: (r.n_rows, r.checksum)
        for r in read_version(spark, tbl).collect()
    }
    whole = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z")], "id long, v string"
    )
    one_shot = {
        r.bucket: (r.n_rows, r.checksum)
        for r in table_fingerprint(whole, canonical).collect()
    }
    assert maintained == one_shot
    assert sum(n for n, _ in maintained.values()) == 3
    # version 1 is the as-of state after the first batch only
    v1 = {r.bucket: r.n_rows for r in read_version(spark, tbl, 1).collect()}
    assert sum(v1.values()) == 2
