"""Fixed-width text ingestion (mainframe / legacy bank extracts).

The reference pipeline ingests CSV only (spark_etl_dag.py); loan-grade
upstream systems routinely hand over COBOL-style fixed-width extracts,
so this is EXT source surface. Design mirrors sources/csv.py: schema
is explicit (a column spec, since fixed-width has no header row), bad
records quarantine instead of poisoning the load, and every field
parse is a single JVM-side expression (substring + trim + try_cast —
no Python in the row path, so the scan whole-stage-codegens and scales
like any text scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

#: column spec entry: (name, 1-based start, length, spark type name)
ColSpec = tuple[str, int, int, str]


def read_fixed_width(
    spark: SparkSession,
    path: str,
    colspecs: list[ColSpec],
    *,
    corrupt_col: str | None = None,
) -> DataFrame:
    """Read a fixed-width text file into typed columns per ``colspecs``.

    Each field is ``try_cast(trim(substring(line, start, length)))`` —
    malformed field text yields NULL, never a job failure. A line
    shorter than the rightmost spec is structurally corrupt: with
    ``corrupt_col`` set, such lines survive with every field NULL and
    the raw line preserved in that column (the CSV quarantine
    contract); without it they are dropped.

    Overlapping or out-of-order specs are allowed (some extracts store
    redundant composite fields); starts must be >= 1.
    """
    if not colspecs:
        raise ValueError("colspecs must be non-empty")
    for name, start, length, _ in colspecs:
        if start < 1 or length < 1:
            raise ValueError(
                f"spec {name!r}: start/length must be >= 1, got {start}/{length}"
            )
    min_len = max(start + length - 1 for _, start, length, _ in colspecs)
    raw = spark.read.text(path)
    ok = F.length("value") >= min_len
    fields = [
        F.when(
            ok,
            F.expr(
                f"try_cast(trim(substring(value, {start}, {length}))"
                f" as {dtype})"
            ),
        ).alias(name)
        for name, start, length, dtype in colspecs
    ]
    if corrupt_col is None:
        return raw.filter(ok).select(*fields)
    return raw.select(
        *fields,
        F.when(~ok, F.col("value")).alias(corrupt_col),
    )
