"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API):
a deterministic synthetic-corpus generator with real partition pruning.

Why an engine needs this: scale probes. Testing "does this operator
stay linear at 8× / 64×?" from parquet requires materializing 8×/64×
the bytes first; a generator source produces any SF on demand, reads
nothing, and — because every row is a pure function of
(seed, doc_id) — produces THE SAME corpus at any partition count, so
probe results are comparable across cluster shapes. The BASELINE.md
scale probes synthesized frames inline; this packages that pattern as
a first-class `spark.read.format(...)` source.

What it demonstrates about the source API (the part that matters for
wrapping real external systems — REST feeds, key-value scans, queue
backfills):

- **partitions()** splits the keyspace into contiguous doc_id ranges —
  one `InputPartition` per range, executed in parallel across the
  cluster like any other scan.
- **pushFilters()** reads doc_id range/equality predicates and turns
  them into partition PRUNING plus per-partition range clamping: a
  ``doc_id < k`` query reads ceil(k/rows_per_partition) partitions, not
  all of them, and generates only the surviving range. EVERY filter —
  including the ones that informed the clamp — is yielded back as
  unsupported so Spark re-applies it above the scan: pushdown is an
  optimization, never a correctness dependency (see the inline comment
  for the self-join scan-sharing hazard that makes this mandatory).
- **read()** yields plain tuples in schema order; workers regenerate
  rows independently — no driver-side materialization, no shuffle.

Register + use::

    spark.dataSource.register(SyntheticDocsDataSource)
    spark.read.format("synthetic_docs").option("n_rows", 1_000_000)
         .option("seed", "probe1").load()

Determinism contract: text is built from md5(seed, doc_id, position)
draws over a fixed vocabulary — language/source assignment and all
row content are reproducible on any engine that can md5 (the same
stance as functions/splits.py md5_coord48).

The reference has no custom sources at all (it reads CSVs Airflow
drops in a directory — reference: airflow/dags/spark_etl_dag.py:46-60);
this is EXT S-family surface per SURVEY.md §2.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

_VOCAB = (
    "key agg row scan slow fast table value part hash merge batch spark "
    "order data column join small line customer query big the a stream "
    "group sort window filter vector"
).split()

_LANGS = ["en", "en", "en", "fr", "de"]  # en-heavy, like real corpora


def _h(*parts) -> int:
    """First 8 md5 bytes of the joined parts as an int — the shared
    deterministic coordinate (one definition, like md5_coord48)."""
    return int.from_bytes(
        hashlib.md5("|".join(str(p) for p in parts).encode()).digest()[:8], "big"
    )


def _row(seed: str, doc_id: int, doc_len: int, n_sources: int) -> tuple:
    toks = [
        _VOCAB[_h(seed, doc_id, i) % len(_VOCAB)]
        for i in range(1 + _h(seed, doc_id, "len") % doc_len)
    ]
    text = " ".join(toks)
    return (
        doc_id,
        text,
        _LANGS[_h(seed, doc_id, "lang") % len(_LANGS)],
        f"src{_h(seed, doc_id, 'src') % n_sources}",
        len(text),
    )


class _RangePartition(InputPartition):
    def __init__(self, lo: int, hi: int):
        self.lo, self.hi = lo, hi


class _SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_partitions = int(options.get("n_partitions", 8))
        self.seed = str(options.get("seed", "0"))
        self.doc_len = int(options.get("doc_len", 50))
        self.n_sources = int(options.get("n_sources", 20))
        self.prune = str(options.get("prune", "false")).lower() == "true"
        if self.n_rows < 0 or self.n_partitions < 1:
            raise ValueError("n_rows must be >= 0 and n_partitions >= 1")
        if self.doc_len < 1 or self.n_sources < 1:
            # validate at plan time: a zero here would surface as opaque
            # ZeroDivisionError task failures inside executors
            raise ValueError("doc_len and n_sources must be >= 1")
        self.lo, self.hi = 0, self.n_rows  # [lo, hi) after pushdown

    def pushFilters(self, filters):
        # Two safety decisions, both load-bearing:
        #
        # 1. Every filter is YIELDED BACK (reported unsupported) even
        #    when it informs the range clamp, so Spark re-applies it
        #    above the scan — pruning is an optimization, never a
        #    correctness dependency.
        # 2. Pruning is OPT-IN (``.option("prune", "true")``). When the
        #    same load() appears twice in ONE plan (a self-join), each
        #    branch plans its own reader with the right clamp — but
        #    Spark 4.1 then reuses the LAST-built Python scan for every
        #    occurrence of the relation (the scan's equality ignores
        #    its pushdown state), so whichever branch planned first
        #    executes with the other branch's partitions. Yield-back
        #    keeps the dropped-filter half of that bug harmless, but an
        #    under-pruned branch loses rows no re-applied filter can
        #    resurrect (observed live: a top-k self-join returned the
        #    probe-side rows for both sides). Default-off means
        #    correctness never depends on how many times a load() is
        #    referenced; opt in per-load when the scan is used once, or
        #    load() separately per branch (distinct relations are never
        #    merged).
        if not self.prune:
            yield from filters
            return
        # A second pushFilters call on the SAME reader (the Spark 4.1
        # scan-reuse path above, when a prune-enabled load() is
        # referenced twice in one plan) would otherwise INTERSECT both
        # branches' ranges — silently losing rows. Reset to the full
        # range on every call so a shared scan degrades to the widest
        # clamp either branch asked for... which is still wrong for the
        # other branch, so on re-invocation disable clamping entirely:
        # unpruned-but-correct (filters are all re-applied above the
        # scan per decision 1).
        if getattr(self, "_push_called", False):
            self.prune = False
            self.lo, self.hi = 0, self.n_rows
            yield from filters
            return
        self._push_called = True
        self.lo, self.hi = 0, self.n_rows
        for f in filters:
            # ColumnPath is a tuple of name parts; top-level doc_id only
            att = getattr(f, "attribute", None)
            if att == ("doc_id",):
                if isinstance(f, EqualTo) and isinstance(f.value, int):
                    self.lo = max(self.lo, f.value)
                    self.hi = min(self.hi, f.value + 1)
                elif isinstance(f, LessThan) and isinstance(f.value, int):
                    self.hi = min(self.hi, f.value)
                elif isinstance(f, LessThanOrEqual) and isinstance(f.value, int):
                    self.hi = min(self.hi, f.value + 1)
                elif isinstance(f, GreaterThan) and isinstance(f.value, int):
                    self.lo = max(self.lo, f.value + 1)
                elif isinstance(f, GreaterThanOrEqual) and isinstance(f.value, int):
                    self.lo = max(self.lo, f.value)
            yield f

    def partitions(self):
        lo, hi = self.lo, max(self.lo, self.hi)
        per = -(-self.n_rows // self.n_partitions) or 1
        out = []
        for p in range(self.n_partitions):
            plo, phi = p * per, min((p + 1) * per, self.n_rows)
            # clamp each range partition to the pushed-down window;
            # fully-excluded partitions are PRUNED (never scheduled)
            clo, chi = max(plo, lo), min(phi, hi)
            if clo < chi:
                out.append(_RangePartition(clo, chi))
        # Spark requires >= 1 partition; an empty one keeps the scan valid
        return out or [_RangePartition(0, 0)]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for doc_id in range(partition.lo, partition.hi):
            yield _row(self.seed, doc_id, self.doc_len, self.n_sources)


class _SyntheticDocsStreamReader(SimpleDataSourceStreamReader):
    """Offset-based micro-batch reader over the same deterministic
    keyspace: offset = next doc_id, each ``read`` serves one batch of
    ``rows_per_batch`` ids and advances; rows beyond ``max_rows`` don't
    exist (yet) — raising max_rows across restarts models a growing
    feed. Because rows are a pure function of (seed, doc_id),
    ``readBetweenOffsets`` replays any checkpointed range bit-
    identically, which is the whole exactly-once story: the offset IS
    the data. Simple (driver-planned) reader by design — the batch
    reader above demonstrates partition planning; a high-throughput
    stream source would move this range logic into
    DataSourceStreamReader.partitions()."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.max_rows = int(options.get("max_rows", 1000))
        self.seed = str(options.get("seed", "0"))
        self.doc_len = int(options.get("doc_len", 50))
        self.n_sources = int(options.get("n_sources", 20))
        if self.rows_per_batch < 1 or self.max_rows < 0:
            raise ValueError("rows_per_batch must be >= 1 and max_rows >= 0")
        if self.doc_len < 1 or self.n_sources < 1:
            raise ValueError("doc_len and n_sources must be >= 1")

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def _rows(self, lo: int, hi: int):
        # a LIST iterator, not a generator: Spark's simple-stream
        # prefetch cache copy.copy()s the iterator it next()s from, and
        # generators can't be copied (list iterators can, via
        # __reduce__)
        return iter(
            [
                _row(self.seed, doc_id, self.doc_len, self.n_sources)
                for doc_id in range(lo, hi)
            ]
        )

    def read(self, start: dict):
        lo = int(start["offset"])
        hi = min(lo + self.rows_per_batch, self.max_rows)
        if hi <= lo:
            return iter([]), {"offset": lo}
        return self._rows(lo, hi), {"offset": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(int(start["offset"]), int(end["offset"]))

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up: regeneration replaces retention


class SyntheticDocsDataSource(DataSource):
    """``spark.read.format("synthetic_docs")`` (batch) and
    ``spark.readStream.format("synthetic_docs")`` (micro-batch) — see
    module docstring."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        # a DDL string, not StructType.fromDDL: schema() runs in the
        # data-source worker process, where no SparkSession exists to
        # parse DDL
        return "doc_id bigint, text string, lang string, source string, n_chars bigint"

    def reader(self, schema: StructType) -> _SyntheticDocsReader:
        return _SyntheticDocsReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> _SyntheticDocsStreamReader:
        return _SyntheticDocsStreamReader(self.options)
