"""Custom Python DataSource (sources/pydatasource.py): registration,
determinism across partition layouts, and pushFilters partition pruning."""

from __future__ import annotations

import os

import pytest

from loan_etl_data_pipeline_spark.sources.pydatasource import (
    SyntheticDocsDataSource,
    _row,
)


@pytest.fixture(scope="module")
def registered(spark):
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticDocsDataSource)
    return spark


def _load(spark, **opts):
    r = spark.read.format("synthetic_docs")
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def test_schema_count_and_rows_match_generator(registered):
    df = _load(registered, n_rows=200, seed="s1")
    assert df.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    rows = sorted(map(tuple, df.collect()))
    assert len(rows) == 200
    # workers must generate exactly the driver-side pure function
    assert rows[7] == _row("s1", 7, 50, 20)
    assert all(r[4] == len(r[1]) for r in rows)


def test_deterministic_across_partition_counts_and_reruns(registered):
    a = sorted(map(tuple, _load(registered, n_rows=300, seed="x").collect()))
    b = sorted(
        map(tuple, _load(registered, n_rows=300, seed="x", n_partitions=13).collect())
    )
    c = sorted(map(tuple, _load(registered, n_rows=300, seed="x").collect()))
    assert a == b == c
    d = sorted(map(tuple, _load(registered, n_rows=300, seed="y").collect()))
    assert a != d


def test_doc_id_pushdown_prunes_partitions(registered):
    df = _load(registered, n_rows=1000, seed="s1", n_partitions=8, prune="true")
    assert df.rdd.getNumPartitions() == 8
    lt = df.filter("doc_id < 100")
    assert lt.rdd.getNumPartitions() == 1  # 7 of 8 ranges pruned
    assert lt.count() == 100
    eq = df.filter("doc_id = 777")
    assert eq.rdd.getNumPartitions() == 1
    assert [r["doc_id"] for r in eq.collect()] == [777]
    # ranges are 125 wide (1000/8): [200, 400) touches [125,250),
    # [250,375), [375,500) — 3 survive, 5 pruned
    mid = df.filter("doc_id >= 200 AND doc_id <= 399")
    assert mid.rdd.getNumPartitions() == 3
    assert mid.count() == 200


def test_pushdown_is_optimization_not_correctness(registered):
    # filters the reader does NOT support must still apply (Spark
    # re-applies everything yielded back from pushFilters)
    full = _load(registered, n_rows=400, seed="s1")
    en = full.filter("lang = 'en'").collect()
    assert 0 < len(en) < 400
    assert all(r["lang"] == "en" for r in en)
    both = full.filter("lang = 'en' AND doc_id < 50")
    got = {r["doc_id"] for r in both.collect()}
    ref = {r["doc_id"] for r in en if r["doc_id"] < 50}
    assert got == ref


def test_empty_and_out_of_range(registered):
    assert _load(registered, n_rows=0, seed="s").count() == 0
    df = _load(registered, n_rows=100, seed="s")
    assert df.filter("doc_id >= 100").count() == 0
    assert df.filter("doc_id < 0").count() == 0


def test_self_join_filters_survive_scan_sharing(registered):
    """When the same relation appears twice in ONE plan, Spark builds a
    single scan from the shared reader's final pushdown state. The
    reader must (a) never consume a filter and (b) un-clamp on the
    second pushFilters call, or one branch loses its filter / its rows
    (found live: a sparse_topk self-join returned 25 000 rows instead
    of 50)."""
    df = _load(registered, n_rows=1000, seed="z")
    q = df.filter("doc_id < 10").selectExpr("doc_id AS qid")
    full = df.selectExpr("doc_id")
    import pyspark.sql.functions as F

    # filtered side planned first and last — both orders must be exact
    assert q.join(full, F.col("qid") != F.col("doc_id")).count() == 10 * 999
    assert full.join(q, F.col("qid") != F.col("doc_id")).count() == 10 * 999
    # two different pushable filters in one plan
    both = (
        df.filter("doc_id < 10")
        .selectExpr("doc_id AS a")
        .join(df.filter("doc_id >= 990").selectExpr("doc_id AS b"), F.col("a") < F.col("b"))
    )
    assert both.count() == 10 * 10
    # with pruning ON, one load() per branch keeps relations distinct —
    # full pruning AND correct results
    qa = _load(registered, n_rows=1000, seed="z", prune="true").filter("doc_id < 10")
    fb = _load(registered, n_rows=1000, seed="z", prune="true").selectExpr(
        "doc_id AS did"
    )
    j3 = qa.join(fb, qa.doc_id != F.col("did"))
    assert j3.count() == 10 * 999


def test_stream_reader_exactly_once_across_restart(registered, tmp_path):
    """Each availableNow run drains one read() batch and checkpoints
    its end offset; successive runs must continue EXACTLY where the
    previous stopped — no dupes, no gaps — including after the feed
    grows (max_rows raised on the same checkpoint)."""
    ckpt = str(tmp_path / "ckpt")

    def run(max_rows):
        got = []

        def sink(bdf, bid):
            got.extend(r["doc_id"] for r in bdf.collect())

        q = (
            registered.readStream.format("synthetic_docs")
            .option("rows_per_batch", 100)
            .option("max_rows", max_rows)
            .option("seed", "st1")
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(got)

    assert run(300) == list(range(0, 100))
    assert run(300) == list(range(100, 200))
    assert run(300) == list(range(200, 300))
    assert run(300) == []  # feed drained: no reprocessing
    assert run(500) == list(range(300, 400))  # feed grew: continue, not restart


# ---- Python DataSource writer (sources/pywriter.py) -------------------


def test_pyjsonl_write_read_roundtrip(spark, tmp_path):
    from loan_etl_data_pipeline_spark.sources.pywriter import (
        JsonLinesDataSource,
    )

    spark.dataSource.register(JsonLinesDataSource)
    df = spark.range(0, 100).selectExpr(
        "id", "CAST(id % 3 AS STRING) AS grp", "id * 1.5 AS score"
    )
    out = str(tmp_path / "jl")
    df.repartition(4).write.format("pyjsonl").option("path", out).mode(
        "append"
    ).save()

    import glob
    import json as _json

    finals = glob.glob(f"{out}/part-*.jsonl")
    assert len(finals) == 4  # one staged file per partition, all promoted
    assert not glob.glob(f"{out}/.staged-*")  # no leftover temp files
    with open(f"{out}/_SUCCESS") as f:
        man = _json.load(f)
    assert man["rows"] == 100
    assert sorted(man["files"]) == sorted(
        os.path.basename(x) for x in finals
    )

    back = spark.read.json(out)
    assert back.count() == 100
    got = {(r["id"], r["grp"]) for r in back.collect()}
    assert got == {(i, str(i % 3)) for i in range(100)}


def test_pyjsonl_overwrite_replaces(spark, tmp_path):
    from loan_etl_data_pipeline_spark.sources.pywriter import (
        JsonLinesDataSource,
    )

    spark.dataSource.register(JsonLinesDataSource)
    out = str(tmp_path / "jl2")
    spark.range(0, 50).write.format("pyjsonl").option("path", out).mode(
        "append"
    ).save()
    spark.range(100, 110).write.format("pyjsonl").option("path", out).mode(
        "overwrite"
    ).save()
    back = spark.read.json(out)
    assert sorted(r["id"] for r in back.collect()) == list(range(100, 110))
    # append after overwrite: the manifest ACCUMULATES files and rows
    import json as _json

    spark.range(200, 205).write.format("pyjsonl").option("path", out).mode(
        "append"
    ).save()
    with open(f"{out}/_SUCCESS") as f:
        man = _json.load(f)
    assert man["rows"] == 15
    back2 = spark.read.json(out)
    assert back2.count() == 15


def test_pyjsonl_requires_path(spark):
    from loan_etl_data_pipeline_spark.sources.pywriter import (
        JsonLinesDataSource,
    )

    spark.dataSource.register(JsonLinesDataSource)
    with pytest.raises(Exception, match="path"):
        spark.range(3).write.format("pyjsonl").mode("append").save()


def test_pyjsonl_failed_write_stages_nothing_visible(spark, tmp_path):
    from loan_etl_data_pipeline_spark.sources.pywriter import (
        JsonLinesDataSource,
    )

    spark.dataSource.register(JsonLinesDataSource)
    out = str(tmp_path / "jl3")
    df = spark.range(0, 10).selectExpr(
        "id", "assert_true(id < 5, 'boom') AS chk"
    )
    with pytest.raises(Exception):
        df.write.format("pyjsonl").option("path", out).mode("append").save()
    import glob

    assert not glob.glob(f"{out}/part-*.jsonl")
    assert not os.path.exists(f"{out}/_SUCCESS")
