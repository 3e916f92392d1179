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
