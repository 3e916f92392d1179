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
  succeeded: promote staged temps first, atomically swap the
  ``_SUCCESS`` manifest (which names the exact live file set and the
  cumulative row count), and only then delete de-listed files — a
  crash at ANY point leaves the previous manifest + its files fully
  readable (same manifest discipline as sources/versioned.py).
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
        # driver-side, all tasks green. Ordering is what makes a crash
        # safe at every point: (1) PROMOTE the staged temps (old data
        # still intact — a crash here leaves old manifest + old files
        # readable, new files inert extras); (2) atomically swap the
        # _SUCCESS manifest, which names the EXACT live file set and
        # the cumulative row count (append mode folds in the previous
        # manifest); (3) only then delete files the manifest no longer
        # names. Manifest-following readers get atomic table states;
        # glob readers see append-then-shrink, never a torn table —
        # the reference's rmtree-then-write does the opposite.
        marker = os.path.join(self.path, "_SUCCESS")
        prev = {"rows": 0, "files": []}
        if not self.overwrite and os.path.exists(marker):
            with open(marker) as f:
                prev = json.load(f)
        finals = []
        for i, m in enumerate(messages):
            final = f"part-{i:05d}-{os.path.basename(m.tmp_path)[8:]}"
            os.rename(m.tmp_path, os.path.join(self.path, final))
            finals.append(final)
        live = ([] if self.overwrite else list(prev["files"])) + finals
        rows = (0 if self.overwrite else prev["rows"]) + sum(
            m.rows for m in messages
        )
        tmp_marker = marker + ".staged"
        with open(tmp_marker, "w") as f:
            json.dump({"rows": rows, "files": live}, f)
        os.replace(tmp_marker, marker)  # atomic manifest swap
        keep = set(live)
        for name in os.listdir(self.path):
            if (
                name.endswith(".jsonl")
                and not name.startswith(".")
                and name not in keep
            ):
                os.remove(os.path.join(self.path, name))

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
