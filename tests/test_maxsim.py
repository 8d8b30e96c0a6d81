"""s26's late-interaction algebra, pinned against a dense numpy
reference: the relational decomposition (cosine per pair -> MAX per
(query, doc, token) -> integer SUM per (query, doc) -> top-k) must
reproduce the textbook MaxSim score computed with plain matmuls, at
the same 1e-6 rounding, on adversarial random data — including docs
with wildly different vector counts (the property the map-side MAX's
cardinality claim rests on) and negative similarities."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F


def _reference_maxsim(M, doc_of, T, q_of):
    """Dense MaxSim: scaled-integer score per (query, doc) — the same
    round-at-1e-6-then-sum-exact-ints discipline as the query."""
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    Tn = T / np.linalg.norm(T, axis=1, keepdims=True)
    sims = np.rint(np.round(Mn @ Tn.T, 6) * 1_000_000.0).astype(np.int64)
    scores = {}
    for q in sorted(set(q_of)):
        toks = [i for i, qq in enumerate(q_of) if qq == q]
        for d in sorted(set(doc_of)):
            rows = [i for i, dd in enumerate(doc_of) if dd == d]
            block = sims[np.ix_(rows, toks)]
            scores[(q, d)] = int(block.max(axis=0).sum())
    return scores


def test_maxsim_decomposition_matches_dense_reference(spark):
    rng = np.random.RandomState(4242)
    dim, n_vecs, n_docs, n_tokens, n_queries = 16, 120, 7, 12, 3
    M = rng.standard_normal((n_vecs, dim))
    # ragged doc sizes: doc 0 gets half the vectors, doc 6 gets one
    doc_of = [0] * 60 + [1] * 20 + [2] * 15 + [3] * 10 + [4] * 8 + [5] * 6 + [6]
    T = rng.standard_normal((n_tokens, dim))
    q_of = [i % n_queries for i in range(n_tokens)]

    corpus = spark.createDataFrame(
        [(int(d), [float(x) for x in row]) for d, row in zip(doc_of, M)],
        "doc_label int, embedding array<double>",
    )
    tokens = spark.createDataFrame(
        [(int(q), int(i), [float(x) for x in T[i]]) for i, q in enumerate(q_of)],
        "q_id long, tok_id long, q_vec array<double>",
    )

    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.functions.vector import (
        cosine_similarity,
    )

    sim6 = F.round(cosine_similarity(F.col("embedding"), F.col("q_vec")), 6)
    got = {
        (r.q_id, r.doc_label): r.maxsim_scaled
        for r in (
            corpus.crossJoin(F.broadcast(tokens))
            .select(
                "q_id", "doc_label", "tok_id",
                F.round(sim6 * 1_000_000.0).cast("long").alias("tok_sim"),
            )
            .groupBy("q_id", "doc_label", "tok_id")
            .agg(F.max("tok_sim").alias("tok_sim"))
            .groupBy("q_id", "doc_label")
            .agg(F.sum("tok_sim").alias("maxsim_scaled"))
            .collect()
        )
    }
    want = _reference_maxsim(M, doc_of, T, q_of)
    assert got == {(q, d): v for (q, d), v in want.items()}


def test_maxsim_single_vector_docs_reduce_to_cosine_sum(spark):
    """With exactly one vector per doc, MaxSim degenerates to the plain
    sum of query-token cosines — the single-vector retrieval s01 runs.
    Pins that the MAX stage is a true no-op there (no off-by-one in
    the grouping keys)."""
    rng = np.random.RandomState(7)
    dim = 8
    M = rng.standard_normal((5, dim))
    T = rng.standard_normal((4, dim))

    corpus = spark.createDataFrame(
        [(i, [float(x) for x in M[i]]) for i in range(5)],
        "doc_label int, embedding array<double>",
    )
    tokens = spark.createDataFrame(
        [(0, i, [float(x) for x in T[i]]) for i in range(4)],
        "q_id long, tok_id long, q_vec array<double>",
    )

    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.functions.vector import (
        cosine_similarity,
    )

    sim6 = F.round(cosine_similarity(F.col("embedding"), F.col("q_vec")), 6)
    scored = (
        corpus.crossJoin(F.broadcast(tokens))
        .select(
            "q_id", "doc_label", "tok_id",
            F.round(sim6 * 1_000_000.0).cast("long").alias("tok_sim"),
        )
        .groupBy("q_id", "doc_label", "tok_id")
        .agg(F.max("tok_sim").alias("tok_sim"))
        .groupBy("q_id", "doc_label")
        .agg(F.sum("tok_sim").alias("maxsim_scaled"))
    )
    got = {r.doc_label: r.maxsim_scaled for r in scored.collect()}

    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    Tn = T / np.linalg.norm(T, axis=1, keepdims=True)
    sims = np.rint(np.round(Mn @ Tn.T, 6) * 1_000_000.0).astype(np.int64)
    want = {i: int(sims[i].sum()) for i in range(5)}
    assert got == want
