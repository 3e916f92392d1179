"""Schema-evolution-tolerant parquet reads.

A long-lived table is written by many pipeline versions: new columns
appear, old files never get rewritten. Spark's default read takes the
schema of ONE footer (whichever file is sampled) — columns added later
silently vanish if an old file is sampled. ``mergeSchema`` unions every
footer instead, and files missing a column read it as null — the
standard additive-evolution contract (same rule Delta/Iceberg apply).

``conform_to`` pins the OUTPUT contract: downstream code gets exactly
the declared columns in declared order, with declared types (cast) and
nulls for columns no file has yet — so a reader deployed ahead of its
writer keeps working.

Cost note for 100 TB: mergeSchema reads every file footer at planning
time (not data, but a listing-sized metadata pass). Production tables
should pin the merged schema in a catalog once discovered; pass it as
``conform_to`` with ``merge=False`` to skip the footer sweep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F
from pyspark.sql.types import StructType


def read_parquet_evolving(
    spark: SparkSession,
    path: str,
    *,
    conform_to: StructType | None = None,
    merge: bool = True,
) -> DataFrame:
    """Read a parquet directory written under additive schema drift."""
    reader = spark.read
    if merge:
        reader = reader.option("mergeSchema", "true")
    df = reader.parquet(path)
    if conform_to is not None:
        cols = [
            F.col(f.name).cast(f.dataType).alias(f.name)
            if f.name in df.columns
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in conform_to.fields
        ]
        df = df.select(*cols)
    return df
