"""Hypothesis property tests for the pure-integer operators: each
randomized case is cross-checked against an independent brute-force
Python implementation (the same role the DuckDB oracles play at SF
scale, here over adversarial shapes the fixtures don't contain).
Example counts stay small — every example is a real Spark job."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from loan_etl_data_pipeline_spark.operators.allocate import largest_remainder
from loan_etl_data_pipeline_spark.operators.graph import bfs_hops
from loan_etl_data_pipeline_spark.operators.skyline import pareto_frontier_2d


@settings(max_examples=10, deadline=None)
@given(
    weights=st.lists(st.integers(min_value=0, max_value=50), min_size=1,
                     max_size=8),
    budget=st.integers(min_value=0, max_value=500),
)
def test_largest_remainder_properties(spark, weights, budget):
    df = spark.createDataFrame(
        [("g", i, w) for i, w in enumerate(weights)], ["grp", "seq", "w"]
    )
    out = {r["seq"]: r["alloc"] for r in
           largest_remainder(df, "grp", "w", budget=budget,
                             order_col="seq").collect()}
    assert sum(out.values()) == budget  # exact conservation, always
    tot = sum(weights)
    for i, w in enumerate(weights):
        exact = budget * w / tot if tot else budget / len(weights)
        # quota property: alloc is floor(exact) or ceil(exact)
        assert abs(out[i] - exact) < 1 + 1e-9


@settings(max_examples=10, deadline=None)
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)),
        min_size=1, max_size=20,
    )
)
def test_pareto_frontier_matches_bruteforce(spark, pts):
    rows = [(i, float(x), y) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, ["id", "x", "y"])
    got = {r["id"] for r in pareto_frontier_2d(df, "x", "y").collect()}
    want = {
        i for i, (x, y) in enumerate(pts)
        if not any(
            (qx <= x and qy <= y and (qx < x or qy < y))
            for qx, qy in pts
        )
    }
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=1, max_size=15,
    ).filter(lambda es: any(a != b for a, b in es)),
    hops=st.integers(min_value=1, max_value=3),
)
def test_bfs_hops_matches_bruteforce(spark, edges, hops):
    edges = [(a, b) for a, b in edges if a != b]
    nodes = sorted({n for e in edges for n in e})
    seeds = [n for n in nodes if n % 3 == 0] or nodes[:1]
    df = spark.createDataFrame(edges, ["src", "dst"])
    sdf = spark.createDataFrame([(s,) for s in seeds], ["id"])
    got = {r["id"]: r["hops"] for r in
           bfs_hops(df, seeds=sdf, max_hops=hops).collect()}
    # brute-force level-synchronous BFS
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for h in range(1, hops + 1):
        nxt = {v for u in frontier for v in adj.get(u, ())} - dist.keys()
        for v in nxt:
            dist[v] = h
        frontier = nxt
    assert got == dist


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 20), st.text(alphabet="abc", max_size=4)),
        min_size=1,
        max_size=30,
    ),
    parts=st.integers(min_value=1, max_value=7),
)
def test_table_fingerprint_multiset_property(spark, rows, parts):
    # fingerprints are equal IFF the row multisets are equal, under any
    # partitioning; independent Python md5 replay is the oracle
    import hashlib

    import pyspark.sql.functions as F

    from loan_etl_data_pipeline_spark.operators.quality import (
        table_fingerprint,
    )

    df = spark.createDataFrame(rows, "k bigint, v string").repartition(parts)
    canon = F.concat_ws("|", F.col("k").cast("string"), F.col("v"))
    got = {r.bucket: (r.n_rows, r.checksum)
           for r in table_fingerprint(df, canon).collect()}
    want: dict = {}
    for k, v in rows:
        h = hashlib.md5(f"{k}|{v}".encode()).hexdigest()
        b = h[31]
        n, c = want.get(b, (0, 0))
        want[b] = (n + 1, c + int(h[:10], 16))
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    toks=st.lists(
        st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"]),
        min_size=1,
        max_size=40,
    )
)
def test_cdc_chunks_reconstruct_property(spark, toks):
    # chunks always partition the token stream: ordered concatenation
    # reconstructs the document verbatim, token counts conserve
    from loan_etl_data_pipeline_spark.operators.dedup import cdc_chunks

    text = " ".join(toks)
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    rows = sorted(cdc_chunks(df, "doc_id", "text").collect(),
                  key=lambda r: r.seg)
    assert " ".join(r.chunk for r in rows) == text
    assert sum(r.n_tokens for r in rows) == len(toks)
