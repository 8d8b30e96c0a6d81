"""Numerical pin for operators/graph.pagerank (d32's engine).

The driver row is rows-only (iterative); correctness is certified here
against a dense numpy power iteration running the SAME update —
damping 0.85, undirected degree-normalized shares, dangling mass
redistributed uniformly — on the SAME edge list.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from conftest import SF_SMOKE

from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.graph import (
    pagerank,
)
from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans import get_spec
from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans.llmops import (
    d04_minhash_lsh_pairs,
)
from real_time_genai_embeddings_for_rag_with_apache_flink_spark.sources.batch import (
    load_table,
)


def _numpy_pagerank(n_ids, edge_pairs, damping=0.85, iterations=5):
    idx = {d: i for i, d in enumerate(n_ids)}
    n = len(n_ids)
    und = {(min(a, b), max(a, b)) for a, b in edge_pairs if a != b}
    deg = np.zeros(n)
    for a, b in und:
        deg[idx[a]] += 1
        deg[idx[b]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        dangling = r[deg == 0].sum()
        contrib = np.zeros(n)
        for a, b in und:
            ia, ib = idx[a], idx[b]
            contrib[ib] += r[ia] / deg[ia]
            contrib[ia] += r[ib] / deg[ib]
        r = (1 - damping) / n + damping * dangling / n + damping * contrib
    return {d: r[idx[d]] for d in n_ids}


def test_pagerank_matches_dense_numpy_and_sums_to_one(spark):
    pairs = d04_minhash_lsh_pairs(spark, SF_SMOKE)
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id")
    got = {
        r.doc_id: r.pagerank
        for r in pagerank(pairs, docs, iterations=5).collect()
    }
    n_ids = sorted(r.doc_id for r in docs.collect())
    edge_pairs = [(r.id_a, r.id_b) for r in pairs.collect()]
    want = _numpy_pagerank(n_ids, edge_pairs)

    assert set(got) == set(want)
    assert abs(sum(got.values()) - 1.0) < 1e-9, "ranks must stay a distribution"
    for d in want:
        assert abs(got[d] - want[d]) < 1e-12, f"doc {d}: {got[d]} vs {want[d]}"

    # hubs outrank leaves: every connected doc beats every dangling doc
    connected = {a for e in edge_pairs for a in e}
    if connected and len(connected) < len(n_ids):
        min_conn = min(got[d] for d in connected)
        dangling_rank = max(got[d] for d in n_ids if d not in connected)
        assert min_conn > dangling_rank


def test_d32_entry_runs_and_is_complete(spark):
    out = get_spec("d32_dup_graph_pagerank").build(spark, SF_SMOKE)
    rows = out.collect()
    n_docs = load_table(spark, SF_SMOKE, "documents").count()
    assert len(rows) == n_docs
    assert out.columns == ["doc_id", "pagerank"]


def test_pagerank_foreign_edge_endpoints_conserve_mass(spark):
    """An edge endpoint absent from the node table must not siphon rank
    mass: pagerank computes on the INDUCED subgraph of `nodes`, so the
    result still sums to 1 and matches numpy on the kept edges."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 99), (99, 98)], "id_a long, id_b long"
    )
    nodes = spark.createDataFrame([(1,), (2,), (3,)], "doc_id long")
    got = {r.doc_id: r.pagerank for r in pagerank(edges, nodes).collect()}
    assert set(got) == {1, 2, 3}
    assert abs(sum(got.values()) - 1.0) < 1e-12
    want = _numpy_pagerank([1, 2, 3], [(1, 2)])
    for d in want:
        assert abs(got[d] - want[d]) < 1e-12


def _numpy_pagerank_fp(n_ids, edge_pairs, iterations=5, scale=10**12):
    """Dense replay of pagerank_fixed_point's integer recurrence."""
    idx = {d: i for i, d in enumerate(n_ids)}
    n = len(n_ids)
    und = {(min(a, b), max(a, b)) for a, b in edge_pairs if a != b}
    deg = [0] * n
    for a, b in und:
        deg[idx[a]] += 1
        deg[idx[b]] += 1
    unit = scale // n
    r = [unit] * n
    for _ in range(iterations):
        dangling = sum(r[i] for i in range(n) if deg[i] == 0)
        contrib = [0] * n
        for a, b in und:
            ia, ib = idx[a], idx[b]
            contrib[ib] += r[ia] // deg[ia]
            contrib[ia] += r[ib] // deg[ib]
        base = 15 * unit + 85 * (dangling // n)
        r = [(base + 85 * contrib[i]) // 100 for i in range(n)]
    return {d: r[idx[d]] for d in n_ids}


def test_pagerank_fixed_point_matches_pure_python_replay(spark):
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.graph import (
        pagerank_fixed_point,
    )

    pairs = d04_minhash_lsh_pairs(spark, SF_SMOKE)
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id")
    got = {
        r.doc_id: r.rank_fp
        for r in pagerank_fixed_point(pairs, docs, iterations=5).collect()
    }
    n_ids = sorted(r.doc_id for r in docs.collect())
    edge_pairs = [(r.id_a, r.id_b) for r in pairs.collect()]
    want = _numpy_pagerank_fp(n_ids, edge_pairs)
    assert got == want, "fixed-point ranks must be BIT-identical to the replay"

    # the fixed-point values track the float ranks to ~1e-9 of mass
    flt = _numpy_pagerank(n_ids, edge_pairs)
    for d in want:
        assert abs(want[d] / 10**12 - flt[d]) < 1e-7


def test_pagerank_fixed_point_empty_graph_and_foreign_edges(spark):
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.graph import (
        pagerank_fixed_point,
    )

    # no edges: every node ends at the same deterministic fixpoint value
    nodes = spark.createDataFrame([(1,), (2,), (3,)], "doc_id long")
    empty = spark.createDataFrame([], "id_a long, id_b long")
    got = {r.doc_id: r.rank_fp for r in pagerank_fixed_point(empty, nodes).collect()}
    want = _numpy_pagerank_fp([1, 2, 3], [])
    assert got == want
    assert len(set(got.values())) == 1

    # foreign endpoints drop (induced subgraph), exactly like numpy on kept edges
    edges = spark.createDataFrame(
        [(1, 2), (2, 99), (99, 98)], "id_a long, id_b long"
    )
    got2 = {r.doc_id: r.rank_fp for r in pagerank_fixed_point(edges, nodes).collect()}
    assert got2 == _numpy_pagerank_fp([1, 2, 3], [(1, 2)])
