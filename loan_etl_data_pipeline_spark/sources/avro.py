"""Avro Object Container File source/sink — pure Python, zero deps.

Avro is the lake-interchange format this environment's Spark build
cannot read: the ``spark-avro`` connector module is not on the
classpath (only avro-core jars ship with the PyPI distribution), and
no Python avro library is installed. Same situation as Excel landing
(sources/excel.py), same answer: implement the container format from
the public spec (https://avro.apache.org/docs/current/specification/)
against the stdlib, and distribute the per-file work with Spark — the
*file* is the parallel unit (``binaryFile`` scan → Arrow-batched
``mapInPandas`` decode), exactly how the JVM connector parallelizes.

Supported surface (the lake-interchange core):
- container: magic ``Obj\\x01``, metadata map, 16-byte sync, blocks;
  codecs ``null`` and ``deflate`` (raw RFC-1951, zlib wbits=-15);
- top-level ``record`` schema with primitive fields — null, boolean,
  int, long, float, double, string, bytes — plus the ubiquitous
  nullable union ``["null", T]`` / ``[T, "null"]``;
- zigzag-varint longs, little-endian IEEE floats, length-prefixed
  UTF-8/bytes, per the spec's binary encoding.

Logical types (timestamp-micros et al.) surface as their underlying
primitive; anything else (nested records, arrays, maps, enums, fixed)
raises with the offending type named — honest boundaries, not silent
nulls.

Scale: reading is one ``binaryFile`` scan (each .avro file one row →
one decode task; Avro's block structure would allow sub-file splits,
but multi-GB single files should be written as directories of
block-sized files anyway — which is what :func:`write_avro` emits,
one file per partition). Writing stages one file per partition and
commits a ``_SUCCESS`` manifest last, the house write-then-commit
protocol (sources/pywriter.py, versioned.py).
"""

from __future__ import annotations

import io
import json
import os
import struct
import uuid
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F
import pyspark.sql.types as T

_MAGIC = b"Obj\x01"

_AVRO_TO_SPARK = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "bytes": T.BinaryType(),
    "null": T.NullType(),
}

_SPARK_TO_AVRO = {
    "boolean": "boolean",
    "integer": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "binary": "bytes",
}


# ---------------------------------------------------------------- decode


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) != n:
            raise EOFError("truncated Avro data")
        self.pos += n
        return b

    def long(self) -> int:
        """Zigzag varint (spec: int and long share this encoding)."""
        shift, acc = 0, 0
        while True:
            byte = self.buf[self.pos]
            self.pos += 1
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)

    def bytes_(self) -> bytes:
        return self.read(self.long())

    def string(self) -> str:
        return self.bytes_().decode("utf-8")


def _field_type(t):
    """Normalize a field's schema to (base_type_str, nullable)."""
    if isinstance(t, dict):  # logical types ride on a primitive
        t = t.get("type", t)
    if isinstance(t, str):
        return t, False
    if isinstance(t, list):  # union: only ["null", T] (either order)
        non_null = [x for x in t if x != "null"]
        if len(t) > 2 or len(non_null) != 1:
            raise NotImplementedError(f"unsupported Avro union {t!r}")
        base = non_null[0]
        if isinstance(base, dict):
            base = base.get("type", base)
        if not isinstance(base, str):
            raise NotImplementedError(f"unsupported Avro union {t!r}")
        return base, True
    raise NotImplementedError(f"unsupported Avro type {t!r}")


def _decode_value(r: _Reader, base: str):
    if base == "null":
        return None
    if base == "boolean":
        return r.read(1) == b"\x01"
    if base in ("int", "long"):
        return r.long()
    if base == "float":
        return struct.unpack("<f", r.read(4))[0]
    if base == "double":
        return struct.unpack("<d", r.read(8))[0]
    if base == "string":
        return r.string()
    if base == "bytes":
        return r.bytes_()
    raise NotImplementedError(f"unsupported Avro type {base!r}")


def _parse_header(r: _Reader) -> tuple[dict, str, bytes]:
    if r.read(4) != _MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    meta = {}
    while True:
        n = r.long()
        if n == 0:
            break
        if n < 0:  # block form: abs(count) then byte size
            n = -n
            r.long()
        for _ in range(n):
            # key MUST be read before value (python evaluates an
            # assignment's RHS before the subscript expression)
            key = r.string()
            meta[key] = r.bytes_()
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    sync = r.read(16)
    return schema, codec, sync


def _decode_file(blob: bytes) -> tuple[list[tuple], list[str]]:
    r = _Reader(blob)
    schema, codec, sync = _parse_header(r)
    if schema.get("type") != "record":
        raise NotImplementedError(
            f"top-level Avro type must be record, got {schema.get('type')!r}"
        )
    # per field: (base type, null branch index or -1 for non-nullable) —
    # which union branch is null depends on declaration order
    # (["null",T] vs [T,"null"]), resolved once here, not per row
    fields = []
    for f in schema["fields"]:
        base, nullable = _field_type(f["type"])
        null_branch = (
            f["type"].index("null")
            if nullable and isinstance(f["type"], list)
            else -1
        )
        fields.append((f["name"], base, null_branch))
    rows: list[tuple] = []
    while r.pos < len(r.buf):
        n_records = r.long()
        n_bytes = r.long()
        data = r.read(n_bytes)
        if codec == "deflate":
            data = zlib.decompress(data, wbits=-15)
        elif codec != "null":
            raise NotImplementedError(f"unsupported Avro codec {codec!r}")
        br = _Reader(data)
        for _ in range(n_records):
            row = []
            for _name, base, null_branch in fields:
                if null_branch >= 0:
                    idx = br.long()
                    row.append(
                        None if idx == null_branch
                        else _decode_value(br, base)
                    )
                else:
                    row.append(_decode_value(br, base))
            rows.append(tuple(row))
        if r.read(16) != sync:
            raise ValueError("Avro block sync marker mismatch")
    return rows, [f[0] for f in fields]


def avro_spark_schema(schema: dict) -> T.StructType:
    fields = []
    for f in schema["fields"]:
        base, nullable = _field_type(f["type"])
        if base == "null":
            nullable = True
        fields.append(
            T.StructField(f["name"], _AVRO_TO_SPARK[base], nullable)
        )
    return T.StructType(fields)


def read_avro(
    spark: SparkSession,
    path: str,
    *,
    schema: T.StructType | None = None,
) -> DataFrame:
    """Read a file/dir/glob of .avro container files as a DataFrame.

    With no explicit ``schema`` the writer schema is taken from ONE
    file's header (driver-side open of the first matching file —
    local/NFS paths; pass ``schema`` explicitly for object stores).
    All files must share the schema, the usual lake contract.
    """
    import glob as _glob

    from loan_etl_data_pipeline_spark.session import ensure_worker_imports

    # _scan closes over module-level _decode_file BY MODULE NAME, so
    # executor workers must be able to import this package — they don't
    # inherit the driver's sys.path (only its cwd, which is NOT
    # guaranteed to be the repo). Same posture as operators/ivf.py.
    ensure_worker_imports(spark)

    if schema is None:
        candidates = (
            sorted(_glob.glob(os.path.join(path, "*.avro")))
            if os.path.isdir(path)
            else sorted(_glob.glob(path)) or [path]
        )
        with open(candidates[0], "rb") as fh:
            avro_schema, _, _ = _parse_header(_Reader(fh.read(1 << 20)))
        schema = avro_spark_schema(avro_schema)

    names = [f.name for f in schema.fields]

    def _scan(batches):
        import pandas as pd

        for pdf in batches:
            for blob in pdf["content"]:
                rows, cols = _decode_file(bytes(blob))
                if cols != names:
                    raise ValueError(
                        f"Avro file columns {cols} != expected {names}"
                    )
                yield pd.DataFrame(rows, columns=names)

    src = os.path.join(path, "*.avro") if os.path.isdir(path) else path
    binf = spark.read.format("binaryFile").load(src).select("content")
    return binf.mapInPandas(_scan, schema=schema)


# ---------------------------------------------------------------- encode


def _zigzag(n: int) -> bytes:
    acc = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    out = bytearray()
    while True:
        b = acc & 0x7F
        acc >>= 7
        if acc:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encode_value(base: str, v) -> bytes:
    if base == "boolean":
        return b"\x01" if v else b"\x00"
    if base in ("int", "long"):
        return _zigzag(int(v))
    if base == "float":
        return struct.pack("<f", float(v))
    if base == "double":
        return struct.pack("<d", float(v))
    if base == "string":
        b = str(v).encode("utf-8")
        return _zigzag(len(b)) + b
    if base == "bytes":
        b = bytes(v)
        return _zigzag(len(b)) + b
    raise NotImplementedError(f"unsupported Avro type {base!r}")


def write_avro(
    df: DataFrame,
    dir_path: str,
    *,
    codec: str = "deflate",
    name: str = "spark_export",
) -> int:
    """Write ``df`` as a directory of .avro container files, one per
    partition (nullable union ["null", T] per column), committing a
    ``_SUCCESS`` manifest last. Returns the row count written.

    Spark→Avro type map covers the primitive lake core; unsupported
    column types raise up front with the column named.
    """
    from loan_etl_data_pipeline_spark.session import ensure_worker_imports

    # the writer kernel closes over module-level encoders by module
    # name — see read_avro
    ensure_worker_imports(df.sparkSession)

    if codec not in ("null", "deflate"):
        raise ValueError(f"codec must be null|deflate, got {codec!r}")
    fields = []
    for f in df.schema.fields:
        tname = f.dataType.typeName()
        if tname not in _SPARK_TO_AVRO:
            raise NotImplementedError(
                f"column {f.name!r}: Spark type {tname} has no Avro mapping here"
            )
        fields.append(
            {"name": f.name, "type": ["null", _SPARK_TO_AVRO[tname]]}
        )
    avro_schema = json.dumps(
        {"type": "record", "name": name, "fields": fields}
    )
    bases = [_SPARK_TO_AVRO[f.dataType.typeName()] for f in df.schema.fields]
    cols = [f.name for f in df.schema.fields]
    os.makedirs(dir_path, exist_ok=True)

    def _write(batches):
        import pandas as pd

        body = io.BytesIO()
        n = 0
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                for base, v in zip(bases, row):
                    if v is None or (isinstance(v, float) and v != v and base not in ("float", "double")):
                        body.write(_zigzag(0))  # union branch 0 = null
                    else:
                        body.write(_zigzag(1))
                        body.write(_encode_value(base, v))
                n += 1
        if n == 0:
            yield pd.DataFrame({"rows": [0]})
            return
        payload = body.getvalue()
        if codec == "deflate":
            co = zlib.compressobj(wbits=-15)
            payload = co.compress(payload) + co.flush()
        sync = uuid.uuid4().bytes
        out = io.BytesIO()
        out.write(_MAGIC)
        meta = {
            "avro.schema": avro_schema.encode(),
            "avro.codec": codec.encode(),
        }
        out.write(_zigzag(len(meta)))
        for k, v in meta.items():
            kb = k.encode()
            out.write(_zigzag(len(kb)) + kb)
            out.write(_zigzag(len(v)) + v)
        out.write(_zigzag(0))
        out.write(sync)
        out.write(_zigzag(n))
        out.write(_zigzag(len(payload)))
        out.write(payload)
        out.write(sync)
        fname = os.path.join(dir_path, f"part-{uuid.uuid4().hex}.avro")
        tmp = fname + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(out.getvalue())
        os.rename(tmp, fname)
        yield pd.DataFrame({"rows": [n]})

    counts = df.select(cols).mapInPandas(_write, schema="rows long")
    total = counts.agg(F.sum("rows")).collect()[0][0] or 0
    with open(os.path.join(dir_path, "_SUCCESS"), "w") as fh:
        fh.write(str(total))
    return int(total)
