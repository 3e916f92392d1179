"""Custom Python DataSource WRITER (Spark 4 `pyspark.sql.datasource`
write API) — the sink-side twin of sources/pydatasource.py's reader.

Why an engine needs this: wrapping external sinks (REST ingestion
endpoints, key-value stores, queue producers) as first-class
``df.write.format(...)`` targets with Spark's two-phase commit
protocol instead of ad-hoc ``foreachPartition`` code. The protocol is
the part worth demonstrating:

- **write(iterator)** runs once per partition ON THE EXECUTORS and
  stages that partition's output under a task-unique temp name —
  nothing is visible to readers yet. Returns a (picklable)
  WriterCommitMessage naming what was staged.
- **commit(messages)** runs ON THE DRIVER only after EVERY task
  succeeded: temp files are atomically renamed to their final names
  and a ``_SUCCESS`` marker is written LAST — a crash anywhere before
  that leaves only invisible temp files, never a torn table
  (same manifest-last discipline as sources/versioned.py).
- **abort(messages)** deletes whatever was staged when any task
  failed, so retries never double-write.

The demo sink is JSON-lines over a directory (readable back with
``spark.read.json``); on a cluster the directory must be shared
storage — the staging/commit protocol itself is path-agnostic.

The reference writes its outputs with bare ``to_parquet`` after an
rmtree (reference: airflow/dags/spark_etl_dag.py:63-69 — one bad batch
deletes all history, and a crash mid-write leaves a half table); this
is EXT S-family surface per SURVEY.md §2.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


class _StagedFile(WriterCommitMessage):
    def __init__(self, tmp_path: str, rows: int):
        self.tmp_path = tmp_path
        self.rows = rows


class _JsonLinesWriter(DataSourceWriter):
    def __init__(self, options, schema: StructType, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("pyjsonl requires .option('path', ...)")
        self.columns = list(schema.fieldNames())
        self.overwrite = overwrite

    def write(self, iterator):
        # executor-side: stage under a dot-prefixed temp name (hidden
        # from spark.read.json and any directory listing convention)
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f".staged-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                rec = {c: row[i] for i, c in enumerate(self.columns)}
                f.write(json.dumps(rec, default=str) + "\n")
                n += 1
        return _StagedFile(tmp, n)

    def commit(self, messages):
        # driver-side, all tasks green: clear old data (overwrite mode),
        # promote temps, then the _SUCCESS marker LAST
        if self.overwrite:
            for name in os.listdir(self.path):
                if name.endswith(".jsonl") and not name.startswith("."):
                    os.remove(os.path.join(self.path, name))
            marker = os.path.join(self.path, "_SUCCESS")
            if os.path.exists(marker):
                os.remove(marker)
        for i, m in enumerate(messages):
            final = os.path.join(
                self.path, f"part-{i:05d}-{os.path.basename(m.tmp_path)[8:]}"
            )
            os.rename(m.tmp_path, final)
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            json.dump({"rows": sum(m.rows for m in messages)}, f)

    def abort(self, messages):
        for m in messages:
            try:
                os.remove(m.tmp_path)
            except FileNotFoundError:
                pass


class JsonLinesDataSource(DataSource):
    """``df.write.format("pyjsonl").option("path", d).save()``."""

    @classmethod
    def name(cls) -> str:
        return "pyjsonl"

    def writer(self, schema: StructType, overwrite: bool) -> _JsonLinesWriter:
        return _JsonLinesWriter(self.options, schema, overwrite)
