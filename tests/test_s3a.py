"""S3A sink wiring (session.py s3a_conf_map): the one Part-A component
with no object store in the sandbox. Two layers of evidence:

1. the conf map is exactly the ``spark.hadoop.fs.s3a.*`` keys the
   Hadoop S3A connector reads (unit-level, no store needed);
2. an actual ``s3a://`` write attempt on a session carrying those keys
   gets PAST Spark's scheme resolution — the failure is the
   environment's missing hadoop-aws jar (ClassNotFoundException for
   S3AFileSystem, raised by Hadoop's impl loader AFTER it resolved
   ``fs.s3a.impl`` from our configuration) or, when the jar is present,
   a connection-level error against the unroutable endpoint. Either
   proves the path is wired; a config-level failure ("No FileSystem for
   scheme: s3a") would fail the test.
"""

from __future__ import annotations

import pytest

from loan_etl_data_pipeline_spark.session import s3a_conf_map


def test_conf_map_exact_keys():
    got = s3a_conf_map(
        {"endpoint": "http://minio:9000", "access_key": "ak", "secret_key": "sk"}
    )
    assert got == {
        "spark.hadoop.fs.s3a.endpoint": "http://minio:9000",
        "spark.hadoop.fs.s3a.access.key": "ak",
        "spark.hadoop.fs.s3a.secret.key": "sk",
        "spark.hadoop.fs.s3a.path.style.access": "true",
        "spark.hadoop.fs.s3a.connection.ssl.enabled": "false",
    }


def test_conf_map_virtual_host_style():
    got = s3a_conf_map({"endpoint": "https://s3.example.com", "path_style": False})
    assert got["spark.hadoop.fs.s3a.path.style.access"] == "false"
    assert got["spark.hadoop.fs.s3a.access.key"] == ""


def test_s3a_write_reaches_filesystem_layer(spark, tmp_path):
    """Write to s3a:// with the conf applied; the error must come from
    the S3A filesystem layer (missing jar or connection refusal), never
    from scheme resolution — that distinction is what separates "wired
    but environment lacks the store" from "not wired at all"."""
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    prev = {}
    pairs = [
        (k.removeprefix("spark.hadoop."), v)
        for k, v in s3a_conf_map(
            # nothing listens on port 1: with hadoop-aws present this
            # fails fast with ConnectException, not a hang
            {"endpoint": "http://127.0.0.1:1", "access_key": "x", "secret_key": "x"}
        ).items()
    ]
    for k, v in pairs:
        prev[k] = hconf.get(k)
        hconf.set(k, v)
    try:
        df = spark.createDataFrame([(1,)], "id long")
        with pytest.raises(Exception) as ei:
            df.write.mode("overwrite").parquet("s3a://verify-bucket/out")
        msg = str(ei.value)
        assert "No FileSystem for scheme" not in msg, msg
        wired = (
            # sandbox: Hadoop resolved fs.s3a.impl from our conf, then
            # failed to LOAD the class (hadoop-aws jar not shipped)
            "S3AFileSystem" in msg
            # real store absent but jar present: endpoint actually dialed
            or "Connect" in msg
            or "connection" in msg.lower()
        )
        assert wired, msg
    finally:
        for k, v in prev.items():
            if v is None:
                hconf.unset(k)
            else:
                hconf.set(k, v)


def test_conf_values_drive_a_live_s3_api(tmp_path):
    """The strongest in-sandbox evidence the s3a wiring is RIGHT: stand
    up a real S3 API (moto server), authenticate with the conf map's
    exact endpoint/access/secret/path-style VALUES, and round-trip a
    parquet object bit-for-bit.

    What this does and doesn't prove: the values we hand the S3A
    connector are sufficient to drive a live S3-protocol store
    (endpoint reachable, credentials accepted, path-style addressing,
    object write→read identity) — i.e. any failure of a real
    `write.parquet("s3a://…")` on a cluster is the Hadoop connector's
    own packaging, not this engine's configuration. The full
    Spark-side round-trip stays environment-bound: the sandbox's Spark
    distribution ships NO hadoop-aws/aws-sdk jar (filesystem-wide
    search) and has no network to fetch one, so S3AFileSystem cannot
    be loaded at all — recorded as the permanent boundary in
    SURVEY.md §2 (S6).
    """
    moto = pytest.importorskip("moto")
    import threading

    import boto3
    import pyarrow as pa
    import pyarrow.parquet as pq

    from moto.server import ThreadedMotoServer

    server = ThreadedMotoServer(port=0, verbose=False)
    server.start()
    try:
        host, port = server.get_host_and_port()
        conf = s3a_conf_map(
            {
                "endpoint": f"http://{host}:{port}",
                "access_key": "graft-ak",
                "secret_key": "graft-sk",
            }
        )
        # build the boto3 client FROM the conf map's values — the same
        # strings the S3A connector would read
        client = boto3.client(
            "s3",
            endpoint_url=conf["spark.hadoop.fs.s3a.endpoint"],
            aws_access_key_id=conf["spark.hadoop.fs.s3a.access.key"],
            aws_secret_access_key=conf["spark.hadoop.fs.s3a.secret.key"],
            config=boto3.session.Config(
                s3={
                    "addressing_style": "path"
                    if conf["spark.hadoop.fs.s3a.path.style.access"] == "true"
                    else "virtual"
                }
            ),
            region_name="us-east-1",
        )
        client.create_bucket(Bucket="graft-bucket")

        table = pa.table({"id": [1, 2, 3], "v": [1.5, 2.5, 3.5]})
        buf = pa.BufferOutputStream()
        pq.write_table(table, buf)
        payload = buf.getvalue().to_pybytes()
        client.put_object(
            Bucket="graft-bucket", Key="out/part-0.parquet", Body=payload
        )

        got = client.get_object(Bucket="graft-bucket", Key="out/part-0.parquet")
        body = got["Body"].read()
        assert body == payload  # byte-identical round-trip
        back = pq.read_table(pa.BufferReader(body))
        assert back.equals(table)
    finally:
        server.stop()
