"""Connected components via alternating large-star/small-star
(operators/graph.py): correctness vs a union-find reference, the
O(log n)-vs-O(diameter) convergence claim, and d21/d08 equivalence on
the real LSH candidate pairs."""

from __future__ import annotations

import random

import pytest

from conftest import SF_SMOKE


def _union_find(n_edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in n_edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def _run(spark, edges: list[tuple[int, int]]) -> dict[int, int]:
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.graph import (
        connected_components_star,
    )

    df = spark.createDataFrame(edges, "id_a: long, id_b: long")
    out = connected_components_star(df)
    return {r["doc_id"]: r["component"] for r in out.collect()}


def test_star_components_random_graph(spark):
    rng = random.Random(7)
    nodes = list(range(200))
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(150)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    got = _run(spark, edges)
    want = _union_find(edges)
    assert got == want


def test_star_components_long_chain_and_round_count(spark):
    """A 256-node path with shuffled ids: diameter 255, so label
    propagation needs ~255 rounds; the star alternation must finish in
    O(log^2 n) — we pin <= 12 alternations and exact labels."""
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.graph import (
        star_round_count,
    )

    rng = random.Random(11)
    ids = list(range(1000, 1256))
    rng.shuffle(ids)
    edges = list(zip(ids, ids[1:]))
    got = _run(spark, edges)
    want = _union_find(edges)
    assert got == want
    assert set(got.values()) == {min(ids)}
    df = spark.createDataFrame(edges, "id_a: long, id_b: long")
    rounds = star_round_count(df)
    assert rounds <= 12, rounds


def test_star_components_star_and_clique_shapes(spark):
    # Pre-star and clique inputs converge immediately and keep labels.
    edges = [(0, i) for i in range(1, 9)]  # already a star
    edges += [(a, b) for a in range(100, 105) for b in range(100, 105) if a < b]
    edges += [(500, 501)]  # a single pair
    got = _run(spark, edges)
    want = _union_find(edges)
    assert got == want


def test_star_components_self_loops_and_dupes_ignored(spark):
    edges = [(3, 3), (1, 2), (2, 1), (1, 2), (4, 4)]
    got = _run(spark, edges)
    # Self-loop-only nodes still appear, labeled by themselves.
    assert got == {1: 1, 2: 1, 3: 3, 4: 4}


def test_d22_matches_spark_recursive_cte(spark):
    """Spark 4.1 parses WITH RECURSIVE (UNION ALL only). On the real
    sf0.001 dup graph, the hop-bounded recursive form must agree with
    d22's frontier BFS — pinning that the engine's iterative loop and
    Spark's own recursion compute the same BFS distances."""
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans import (
        get_spec,
    )
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans.llmops import (
        d04_minhash_lsh_pairs,
    )

    bound = 4  # UNION ALL counts walks, not nodes: keep the bound tight
    d04_minhash_lsh_pairs(spark, SF_SMOKE).createOrReplaceTempView(
        "lsh_pairs_v"
    )
    rec = spark.sql(
        f"""
WITH RECURSIVE edges AS (
  SELECT id_a AS u, id_b AS v FROM lsh_pairs_v
  UNION ALL
  SELECT id_b, id_a FROM lsh_pairs_v
),
walk(doc_id, hop) AS (
  SELECT u, 0 FROM (SELECT DISTINCT u FROM edges) WHERE u % 10 = 0
  UNION ALL
  SELECT e.v, w.hop + 1
  FROM walk w JOIN edges e ON e.u = w.doc_id
  WHERE w.hop < {bound}
)
SELECT doc_id, MIN(hop) AS min_hops FROM walk GROUP BY doc_id
"""
    )
    got_rec = {(r["doc_id"], r["min_hops"]) for r in rec.collect()}
    bfs = get_spec("d22_seed_reachability").build(spark, SF_SMOKE)
    got_bfs = {
        (r["doc_id"], r["min_hops"])
        for r in bfs.collect()
        if r["min_hops"] <= bound
    }
    assert got_rec == got_bfs
    assert len(got_bfs) > 0


def test_d21_matches_d08_on_lsh_pairs(spark):
    """The two component algorithms must agree row-for-row on the real
    near-dup candidate graph."""
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans import (
        get_spec,
    )

    d08 = {
        (r["doc_id"], r["component"])
        for r in get_spec("d08_dup_components").build(spark, SF_SMOKE).collect()
    }
    d21 = {
        (r["doc_id"], r["component"])
        for r in get_spec("d21_scalable_components").build(spark, SF_SMOKE).collect()
    }
    assert d08 == d21
    assert len(d08) > 0
