"""Entity resolution as ONE composed plan: block → verify → cluster →
golden record.

The loan-domain pipeline the reference never had: near-identical
customer records (typos, re-registrations) collapse into entities.
Every stage is a certified operator — FastSS deletion-neighborhood
pairing (operators/entity.py, certified by q_del1_join), DataFrame
min-label connected components (operators/graph.py, certified by
q_dup_components' recursive-CTE oracle), and a deterministic
survivorship merge — so the composed plan carries a full value oracle
end-to-end (q_entity_resolution).

Scale: blocking is the only stage that touches raw strings (key
fan-out len+1, posting lists bounded); components run on the MATCH
pairs (orders of magnitude smaller than the record set); survivorship
is one agg keyed on the entity label. Nothing quadratic anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from loan_etl_data_pipeline_spark.operators.entity import del1_pairs
from loan_etl_data_pipeline_spark.operators.graph import connected_components


def resolve_entities(
    df: DataFrame,
    id_col: str,
    name_col: str,
    score_col: str,
) -> DataFrame:
    """Collapse records whose ``name_col`` values are within edit
    distance 1 into entities. Output one golden record per entity:
    (entity_id = min member id, n_members, canonical name = the min
    member id's name — provenance-deterministic, not value-arbitrary,
    best score = max ``score_col``). Unmatched records are singleton
    entities of themselves.
    """
    pairs = del1_pairs(df, id_col, name_col)
    comp = connected_components(pairs, "id_a", "id_b").select(
        F.col("id").alias("__cc_id"), "component"
    )
    labeled = (
        df.join(comp, df[id_col] == comp["__cc_id"], "left")
        .withColumn("entity_id", F.coalesce("component", F.col(id_col)))
        .select(
            "entity_id",
            F.col(id_col).alias("__mid"),
            F.col(name_col).alias("__name"),
            F.col(score_col).alias("__score"),
        )
    )
    return labeled.groupBy("entity_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.min(
            F.struct(F.col("__mid"), F.col("__name"))
        )["__name"].alias("canonical_name"),
        F.max("__score").alias("best_score"),
    )
