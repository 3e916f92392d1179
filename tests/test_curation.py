"""Property tests for the curation-family operators: winnowing
fingerprints, SemDeDup pruning, and integer fixed-point PageRank.

The oracle-parity suite certifies the sf0.001 values end to end; these
tests pin the operator GUARANTEES on constructed inputs — the things a
value hash can't express (containment detection, keep-rule semantics,
partitioning invariance, reference-implementation equality).
"""

from __future__ import annotations

import hashlib

import pytest

import pyspark.sql.functions as F

from loan_etl_data_pipeline_spark.operators.graph import pagerank
from loan_etl_data_pipeline_spark.operators.similarity import semantic_dedup
from loan_etl_data_pipeline_spark.operators.text import winnow_fingerprints

K, W = 8, 4


# --- python reference implementations (independent of the Spark code) ---


def _gram_hash(g: str) -> int:
    return int(hashlib.md5(g.encode("utf-8")).hexdigest()[:12], 16)


def _winnow_ref(text: str, k: int = K, w: int = W) -> set[int]:
    if len(text) < k + w - 1:
        return set()
    hs = [_gram_hash(text[i : i + k]) for i in range(len(text) - k + 1)]
    return {min(hs[i : i + w]) for i in range(len(hs) - w + 1)}


def _pagerank_ref(edges, iterations=3, scale=10**9):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    out = {}
    for u, _ in edges:
        out[u] = out.get(u, 0) + 1
    pr = {v: scale // len(nodes) for v in nodes}
    for _ in range(iterations):
        s = {v: 0 for v in nodes}
        for u, v in edges:
            s[v] += pr[u] // out[u]
        pr = {v: 150000000 + (85 * s[v]) // 100 for v in nodes}
    return pr


# --- winnowing ---


def _fps(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = winnow_fingerprints(df, "doc_id", "text", k=K, w=W).collect()
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r["doc_id"], set()).add(r["fp"])
    return out


def test_winnow_matches_python_reference(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "abcdefghijk",  # exactly k+w-1 chars -> exactly one window
        "x" * 30,  # degenerate: all grams identical
        "Zwölf Boxkämpfer jagen Viktor quer über den großen Sylter Deich",
    ]
    got = _fps(spark, list(enumerate(texts)))
    for i, t in enumerate(texts):
        assert got.get(i, set()) == _winnow_ref(t), f"doc {i}"


def test_winnow_short_docs_emit_nothing(spark):
    got = _fps(spark, [(0, "x" * (K + W - 2)), (1, "x" * (K + W - 1))])
    assert 0 not in got
    assert len(got[1]) == 1


def test_winnow_containment_guarantee(spark):
    """Any shared substring of length >= k+w-1 shares >= 1 fingerprint
    (the winnowing theorem) — the property that makes a postings join
    on fp find every long overlap."""
    core = "this exact sentence is embedded in both documents verbatim"
    assert len(core) >= K + W - 1
    a = "PREFIX-A " + core + " SUFFIX-A"
    b = "completely different opening text " + core + " and closing"
    got = _fps(spark, [(0, a), (1, b)])
    assert got[0] & got[1], "containment produced no shared fingerprint"


def test_winnow_fps_are_gram_hashes(spark):
    text = "fingerprints must come from the document's own grams"
    got = _fps(spark, [(0, text)])
    all_grams = {_gram_hash(text[i : i + K]) for i in range(len(text) - K + 1)}
    assert got[0] <= all_grams


# --- semantic dedup ---


def _emb_df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )


def test_semantic_dedup_drops_planted_dup_keeps_min_id(spark):
    base = [1.0, 0.0, 0.0, 0.0]
    near = [0.999, 0.01, 0.0, 0.0]
    ortho = [0.0, 1.0, 0.0, 0.0]
    df = _emb_df(spark, [(1, 0, base), (2, 0, near), (3, 0, ortho)])
    kept = {
        r["vec_id"]
        for r in semantic_dedup(df, threshold=0.95, block_col="label").collect()
    }
    assert kept == {1, 3}


def test_semantic_dedup_blocks_isolate_pairs(spark):
    """Identical vectors in DIFFERENT blocks are both kept — blocking is
    the documented recall/cost trade, so it must actually bound the
    comparison set."""
    v = [0.5, 0.5, 0.5, 0.5]
    df = _emb_df(spark, [(1, 0, v), (2, 1, v)])
    kept = {
        r["vec_id"]
        for r in semantic_dedup(df, threshold=0.5, block_col="label").collect()
    }
    assert kept == {1, 2}


def test_semantic_dedup_zero_vectors_never_match(spark):
    z = [0.0, 0.0, 0.0, 0.0]
    df = _emb_df(spark, [(1, 0, z), (2, 0, z)])
    kept = {
        r["vec_id"]
        for r in semantic_dedup(df, threshold=0.0, block_col="label").collect()
    }
    assert kept == {1, 2}


def test_semantic_dedup_kernels_bit_identical(spark):
    """The arrow (BLAS block-pair) and hof (zip_with/aggregate) routes
    share the floored-int64 cosine contract — survivors must be
    IDENTICAL on data dense enough to exercise sub-blocking, near-dups,
    zero vectors, and multiple blocks."""
    rng = __import__("random").Random(7)
    rows = []
    for i in range(120):
        v = [round(rng.uniform(-1, 1), 3) for _ in range(8)]
        rows.append((i, i % 3, v))
        if i % 10 == 0:  # planted near-dup with a larger id
            rows.append((1000 + i, i % 3, [x * 1.001 for x in v]))
    rows.append((2000, 0, [0.0] * 8))  # zero vector
    df = _emb_df(spark, rows)
    kw = dict(threshold=0.8, block_col="label")
    arrow = {
        r["vec_id"]
        for r in semantic_dedup(df, kernel="arrow", n_blocks=4, **kw).collect()
    }
    hof = {
        r["vec_id"] for r in semantic_dedup(df, kernel="hof", **kw).collect()
    }
    assert arrow == hof
    assert 2000 in arrow  # zero vector survives
    assert len(arrow) < len(rows)  # planted dups actually dropped


def test_semantic_dedup_min_id_rule_not_chain(spark):
    """A(1)~B(2), B~C(3), A!~C: the min-id rule keeps {1, 3}? No —
    C(3) has the smaller-id near neighbor B(2), and B has A(1): both B
    and C are dropped even though B itself is dropped. That is the
    documented difference from the greedy chain (which would keep C).
    """
    a = [1.0, 0.0, 0.0, 0.0]
    b = [0.8, 0.6, 0.0, 0.0]  # cos(a,b)=0.8, cos(b,c)=0.6
    c = [0.0, 1.0, 0.0, 0.0]  # cos(a,c)=0.0
    df = _emb_df(spark, [(1, 0, a), (2, 0, b), (3, 0, c)])
    kept = {
        r["vec_id"]
        for r in semantic_dedup(df, threshold=0.55, block_col="label").collect()
    }
    assert kept == {1}


# --- pagerank ---


def _pr_df(spark, edges, n_parts=1, iterations=3):
    df = spark.createDataFrame(edges, "src long, dst long").repartition(n_parts)
    return {
        r["id"]: r["pr"]
        for r in pagerank(df, iterations=iterations).collect()
    }


CYCLE = [(i, (i + 1) % 5) for i in range(5)]
STAR = [(0, i) for i in range(1, 6)] + [(i, 0) for i in range(1, 6)]


def test_pagerank_matches_python_reference(spark):
    for edges in (CYCLE, STAR, CYCLE + [(7, 8), (8, 7)]):
        assert _pr_df(spark, edges) == _pagerank_ref(edges)


def test_pagerank_uniform_on_regular_graph(spark):
    """On a k-regular symmetric graph every node has identical pr."""
    got = _pr_df(spark, CYCLE + [((i + 1) % 5, i) for i in range(5)])
    assert len(set(got.values())) == 1


def test_pagerank_hub_dominates_star(spark):
    got = _pr_df(spark, STAR)
    hub, leaves = got[0], [got[i] for i in range(1, 6)]
    assert all(hub > x for x in leaves)
    assert len(set(leaves)) == 1


def test_pagerank_partitioning_invariant(spark):
    edges = STAR + [(10, 11), (11, 10), (2, 3), (3, 2)]
    assert _pr_df(spark, edges, n_parts=1) == _pr_df(spark, edges, n_parts=7)


def test_pagerank_dangling_node_keeps_receiving(spark):
    """1→2 only: node 2 has no out-edges (dangling) — it still receives
    from 1 but contributes nothing; documented mass-loss semantics."""
    got = _pr_df(spark, [(1, 2)], iterations=1)
    # pr0 = 1e9//2; node1 gets base only; node2 gets base + 85%·pr0//1
    assert got[1] == 150000000
    assert got[2] == 150000000 + (85 * (10**9 // 2)) // 100


def test_semdedup_cells_composed_guarantee(spark, sf_dir):
    """q_semdedup_cells end product: survivors must contain NO
    within-cell pair at floored-cosine >= tau with distinct ids —
    verified by brute force over the composed output."""
    import numpy as np

    from loan_etl_data_pipeline_spark.queries_curation import (
        _SEMANTIC_TAU,
        q_semdedup_cells,
    )

    kept = {r.vec_id: r.cell for r in q_semdedup_cells(spark, sf_dir).collect()}
    emb = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    assert 0 < len(kept) < len(emb)  # something dropped, something survived

    def fcos(a, b):
        dot = int(np.floor((a * b) * 1e12).astype(np.int64).sum())
        na = int(np.floor((a * a) * 1e12).astype(np.int64).sum())
        nb = int(np.floor((b * b) * 1e12).astype(np.int64).sum())
        if na == 0 or nb == 0:
            return -1.0
        return (dot / 1e12) / (np.sqrt(na / 1e12) * np.sqrt(nb / 1e12))

    by_cell: dict[int, list[int]] = {}
    for vid, cell in kept.items():
        by_cell.setdefault(cell, []).append(vid)
    for cell, ids in by_cell.items():
        ids.sort()
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                assert fcos(emb[a], emb[b]) < _SEMANTIC_TAU, (cell, a, b)


def test_pagerank_empty_edges(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert pagerank(df).collect() == []
