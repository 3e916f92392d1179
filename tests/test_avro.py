"""Pure-Python Avro OCF source/sink (sources/avro.py).

The independent correctness check is a byte fixture HAND-ENCODED from
the Avro 1.11 specification in the test itself (zigzag varints, LE
doubles, length-prefixed strings, deflate raw blocks) — no shared code
with the reader under test.
"""

import io
import json
import os
import struct
import tempfile
import zlib

import pytest

from loan_etl_data_pipeline_spark.sources.avro import read_avro, write_avro


def _zz(n: int) -> bytes:
    """Spec zigzag varint, written independently of the module."""
    u = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _handmade_avro(codec: str = "null") -> bytes:
    schema = json.dumps(
        {
            "type": "record",
            "name": "t",
            "fields": [
                {"name": "id", "type": "long"},
                {"name": "name", "type": ["null", "string"]},
                {"name": "score", "type": "double"},
            ],
        }
    ).encode()
    # two records: (1, "ann", 2.5), (-3, null, -0.25)
    body = io.BytesIO()
    body.write(_zz(1))                      # id = 1
    body.write(_zz(1) + _zz(3) + b"ann")    # union branch 1 + "ann"
    body.write(struct.pack("<d", 2.5))
    body.write(_zz(-3))                     # id = -3
    body.write(_zz(0))                      # union branch 0 = null
    body.write(struct.pack("<d", -0.25))
    payload = body.getvalue()
    if codec == "deflate":
        co = zlib.compressobj(wbits=-15)
        payload = co.compress(payload) + co.flush()
    out = io.BytesIO()
    out.write(b"Obj\x01")
    meta = {b"avro.schema": schema, b"avro.codec": codec.encode()}
    out.write(_zz(len(meta)))
    for k, v in meta.items():
        out.write(_zz(len(k)) + k)
        out.write(_zz(len(v)) + v)
    out.write(_zz(0))
    sync = b"0123456789abcdef"
    out.write(sync)
    out.write(_zz(2))            # 2 records
    out.write(_zz(len(payload)))
    out.write(payload)
    out.write(sync)
    return out.getvalue()


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_reads_spec_handmade_file(spark, codec):
    d = tempfile.mkdtemp()
    with open(os.path.join(d, "hand.avro"), "wb") as fh:
        fh.write(_handmade_avro(codec))
    rows = sorted(map(tuple, read_avro(spark, d).collect()))
    assert rows == [(-3, None, -0.25), (1, "ann", 2.5)]
    df = read_avro(spark, d)
    assert [f.dataType.typeName() for f in df.schema.fields] == [
        "long", "string", "double",
    ]


def test_roundtrip_all_primitives(spark):
    src = spark.createDataFrame(
        [
            (1, "a", 1.5, True, 7, bytearray(b"\x00\x01"), 0.5),
            (2, None, -2.25, False, None, None, None),
        ],
        "id long, s string, d double, b boolean, i int, raw binary, f float",
    )
    d = tempfile.mkdtemp()
    n = write_avro(src, d, codec="deflate")
    assert n == 2
    assert os.path.exists(os.path.join(d, "_SUCCESS"))
    back = read_avro(spark, d)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, src.collect())
    )
    assert [f.dataType.typeName() for f in back.schema.fields] == [
        "long", "string", "double", "boolean", "integer", "binary", "float",
    ]


def test_multipartition_write_reads_complete(spark):
    import pyspark.sql.functions as F

    src = spark.range(1000).repartition(7).select(
        "id", (2 * F.col("id")).alias("dbl")
    )
    d = tempfile.mkdtemp()
    assert write_avro(src, d, codec="null") == 1000
    files = [f for f in os.listdir(d) if f.endswith(".avro")]
    assert len(files) == 7
    back = read_avro(spark, d)
    assert back.count() == 1000
    assert back.agg({"dbl": "sum"}).collect()[0][0] == 2 * sum(range(1000))


def test_unsupported_types_raise(spark):
    src = spark.createDataFrame([([1, 2],)], "arr array<int>")
    with pytest.raises(NotImplementedError, match="arr"):
        write_avro(src, tempfile.mkdtemp())
    with pytest.raises(ValueError, match="codec"):
        write_avro(spark.range(1), tempfile.mkdtemp(), codec="snappy")


def test_avro_ships_worker_imports(spark, monkeypatch, tmp_path):
    """Both avro entry points must call ensure_worker_imports: their
    kernels reference module-level coders BY MODULE NAME, and executor
    workers don't inherit the driver's sys.path — a driver running from
    any cwd other than the repo got ModuleNotFoundError before this
    (caught by the round-5 plain-session driver sim from /tmp)."""
    from loan_etl_data_pipeline_spark import session as sess

    calls = []
    monkeypatch.setattr(
        sess, "ensure_worker_imports", lambda s: calls.append(True)
    )
    d = str(tmp_path / "av")
    write_avro(spark.range(3), d)
    assert calls, "write_avro no longer ships worker imports"
    calls.clear()
    read_avro(spark, d).count()
    assert calls, "read_avro no longer ships worker imports"
