"""Round-8 additions: sketch-state replays and the widened analytics
battery — each with a value-exact DuckDB oracle.

Portability stance unchanged from queries_round7.py (SCALE.md §8 / the
q_autocorr discipline): exact integer moments through the _dec19
decimal ladder, 2^32-limb-split double emissions, transcendentals
limited to sqrt, md5-conv for any hash-driven draw.

Reference anchor: the reference pipeline's analytics surface is the
insights JSON of pyspark_etl.py:47-58 (count/avg/group-count); this
module is part of the EXT battery SURVEY.md §2 Part B mandates on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from loan_etl_data_pipeline_spark.sources.tables import load_table

QUERIES_R8: dict = {}
ORACLE_R8: dict[str, str] = {}


def _q(name):
    def reg(fn):
        QUERIES_R8[name] = fn
        return fn

    return reg


def _limb_sql(c: str) -> str:
    return (
        f"CAST({c} % 4294967296 AS DOUBLE)"
        f" + CAST({c} // 4294967296 AS DOUBLE) * 4294967296.0"
    )


def _dec19(c):
    from loan_etl_data_pipeline_spark.queries import _dec19 as d

    return d(c)


def _limb(c: str):
    from loan_etl_data_pipeline_spark.queries import _limb as l

    return l(c)


# the q_katz_bounded co-purchase graph, shared by the graph oracles here
_COPURCHASE_SQL = """
    li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    adj AS (
        SELECT pa AS u, pb AS v FROM pairs
        UNION ALL SELECT pb AS u, pa AS v FROM pairs
    )
"""


@_q("q_hyperball_replay")
def q_hyperball_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E9+ HyperBall register-state replay (VERDICT r7 ask #5): the
    EXACT integer register table behind q_hyperball_nf's HLL estimate
    — operators/graph.py hyperball_registers, the same md5 register
    init + register-wise-max edge propagation the sketch runs — folded
    per hop into (register count, Σ 2^(49−val) harmonic units).  The
    registers are deterministic integers (engine-portable md5-conv
    draws), so unlike the float HLL estimate this aggregate replays
    exactly in ANSI SQL: after d rounds node v's register at pos is
    the max init val over ball(v, d) members hashing to pos, and the
    oracle materializes the ≤3-hop balls directly.  A green driver row
    hash-certifies the sketch's whole distributed state pipeline; the
    estimate layer on top stays certified against the exact sibling
    q_neighborhood in tests (rows-only by nature).

    Scale: engine side is the sketch's own bounded-state rounds (two
    keyed shuffles per hop, m=64 registers per node forever); harmonic
    units ≤ n_nodes·64·2^48 < 2^95 at any SF, so the _dec19 ladder +
    limb emission hold.  The ball materialization exists ONLY in the
    certification oracle.
    """
    from loan_etl_data_pipeline_spark.operators.graph import (
        hyperball_registers,
    )
    from loan_etl_data_pipeline_spark.queries import _copurchase_edges

    regs = hyperball_registers(
        _copurchase_edges(spark, sf_dir).localCheckpoint(),
        "pa",
        "pb",
        max_hops=3,
        log2m=6,
    )
    return (
        regs.groupBy("hop")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_regs"),
            F.sum(_dec19(F.expr("shiftleft(cast(1 as bigint), 49 - val)")))
            .cast("decimal(38,0)")
            .alias("u"),
        )
        .select(
            F.col("hop").cast("bigint").alias("hops"),
            "n_regs",
            _limb("u").alias("harmonic_units"),
        )
        .orderBy("hops")
    )


ORACLE_R8["q_hyperball_replay"] = f"""
    WITH {_COPURCHASE_SQL},
    nodes AS (SELECT DISTINCT u AS id FROM adj),
    b0 AS (SELECT id AS node, id AS member FROM nodes),
    b1 AS (SELECT node, member FROM b0
           UNION SELECT a.v, b.member FROM b0 b JOIN adj a ON a.u = b.node),
    b2 AS (SELECT node, member FROM b1
           UNION SELECT a.v, b.member FROM b1 b JOIN adj a ON a.u = b.node),
    b3 AS (SELECT node, member FROM b2
           UNION SELECT a.v, b.member FROM b2 b JOIN adj a ON a.u = b.node),
    balls AS (
        SELECT 0 AS hop, node, member FROM b0
        UNION ALL SELECT 1, node, member FROM b1
        UNION ALL SELECT 2, node, member FROM b2
        UNION ALL SELECT 3, node, member FROM b3
    ), hashed AS (
        SELECT hop, node,
               ('0x' || substr(md5(CAST(member AS VARCHAR) || '|hb_bucket'),
                               1, 12))::BIGINT % 64 AS pos,
               ('0x' || substr(md5(CAST(member AS VARCHAR) || '|hb_rank'),
                               1, 12))::BIGINT AS h
        FROM balls
    ), regs AS (
        SELECT hop, node, pos,
               max(CASE WHEN h = 0 THEN 49
                        ELSE 49 - length(bin(h)) END) AS val
        FROM hashed GROUP BY hop, node, pos
    ), agg AS (
        SELECT hop, CAST(count(*) AS BIGINT) AS n_regs,
               sum(CAST(CAST(1 AS BIGINT) << (49 - val) AS HUGEINT)) AS u
        FROM regs GROUP BY hop
    )
    SELECT CAST(hop AS BIGINT) AS hops, n_regs,
           {_limb_sql('u')} AS harmonic_units
    FROM agg ORDER BY hops
"""
