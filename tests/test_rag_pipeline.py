"""p09 end-to-end RAG query: recall floor of the IVF-PQ candidate
stage vs brute-force exact cosine (the s01 pattern) over the SAME chunk
vectors, plus rank/determinism/provenance invariants of the composed
pipeline. The reference delegates this whole path to OpenSearch HNSW
(KDS-P/index-creation-function/lambda_function.py:72-80); these tests
are the engine-side accuracy contract for the in-engine equivalent."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_genai_embeddings_for_rag_with_apache_flink_spark.functions.vector import (
    cosine_similarity,
)
from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans.pipeline_extra import (
    _RAG_CANDIDATES,
    _RAG_K,
    _rag_candidates,
    _rag_chunk_vectors,
    _rag_query_vec,
    p09_rag_query,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def chunk_vecs(spark):
    df = _rag_chunk_vectors(spark, SF).persist()
    df.count()
    yield df
    df.unpersist()


def _exact_topk(chunk_vecs, qvec, k):
    qlit = F.array(*[F.lit(float(x)) for x in qvec])
    return [
        r.vec_id
        for r in (
            chunk_vecs.select(
                "vec_id",
                cosine_similarity(F.col("embedding"), qlit).alias("sim"),
            )
            .orderBy(F.desc("sim"), "vec_id")
            .limit(k)
            .collect()
        )
    ]


@pytest.mark.slow
def test_candidate_stage_recall_floor(spark, chunk_vecs):
    """The approximate candidate fetch must retain >= 50% of the exact
    top-10 inside its 50 candidates — the same floor test_pq.py holds
    ivfpq_search to on the embeddings table."""
    qvec = _rag_query_vec()
    exact10 = set(_exact_topk(chunk_vecs, qvec, 10))
    cand_ids = {
        r.vec_id for r in _rag_candidates(chunk_vecs, qvec, k=_RAG_CANDIDATES).collect()
    }
    recall = len(exact10 & cand_ids) / 10
    assert recall >= 0.5, f"candidate recall@10 = {recall}"


@pytest.mark.slow
def test_p09_output_invariants_and_determinism(spark):
    rows1 = p09_rag_query(spark, SF).collect()
    assert len(rows1) == _RAG_K
    assert [r.rank for r in rows1] == list(range(1, _RAG_K + 1))
    ids = [r.vec_id for r in rows1]
    assert len(set(ids)) == len(ids), "duplicate chunk in results"
    for r in rows1:
        # vec_id packs (doc_id, chunk_idx) — provenance must round-trip
        assert r.vec_id == r.doc_id * 100_000 + r.chunk_idx
        assert r.chunk_text
    # first pick is pure relevance (MMR with an empty picked set)
    assert rows1[0].sim == max(r.sim for r in rows1)
    # end-to-end determinism (k-means init, PQ train, MMR tiebreaks)
    rows2 = p09_rag_query(spark, SF).collect()
    assert [(r.rank, r.vec_id, r.sim, r.mmr) for r in rows1] == [
        (r.rank, r.vec_id, r.sim, r.mmr) for r in rows2
    ]


def test_p09_rescore_matches_exact_cosine(spark, chunk_vecs):
    """The sim column is an EXACT rescore: for every returned chunk it
    must equal the brute-force cosine to the query vector."""
    qvec = _rag_query_vec()
    qlit = F.array(*[F.lit(float(x)) for x in qvec])
    exact = {
        r.vec_id: r.sim
        for r in chunk_vecs.select(
            "vec_id",
            F.round(cosine_similarity(F.col("embedding"), qlit), 6).alias("sim"),
        ).collect()
    }
    for r in p09_rag_query(spark, SF).collect():
        assert r.sim == pytest.approx(exact[r.vec_id], abs=1e-6)


def test_p09b_exact_twin_invariants(spark):
    """p09b (the hash-exact seeded twin) must satisfy the same
    structural contract as p09 — and because its arithmetic is integer
    end to end, a repeat run must be BIT-identical, not just
    rank-stable. The value itself is driver-certified against the
    DuckDB oracle; here we pin the in-engine invariants."""
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans.pipeline_extra import (
        _P09B_K,
        p09b_rag_query_exact,
    )

    rows1 = p09b_rag_query_exact(spark, SF).collect()
    assert len(rows1) == _P09B_K
    assert [r.rank for r in rows1] == list(range(1, _P09B_K + 1))
    ids = [r.vec_id for r in rows1]
    assert len(set(ids)) == len(ids)
    for r in rows1:
        assert r.vec_id == r.doc_id * 100_000 + r.chunk_idx
        assert r.chunk_text
    assert rows1[0].sim == max(r.sim for r in rows1)
    rows2 = p09b_rag_query_exact(spark, SF).collect()
    assert [(r.rank, r.vec_id, r.sim, r.mmr) for r in rows1] == [
        (r.rank, r.vec_id, r.sim, r.mmr) for r in rows2
    ]


def test_p09b_candidates_respect_seeded_ivf_pruning(spark):
    """Every chunk p09b returns must live in one of the 2 probed cells
    of the seeded coarse quantizer — i.e. the ANN stage genuinely
    prunes (a bug that silently fell back to scanning all cells would
    still hash-match the oracle, since the oracle prunes identically;
    this pins the INTENT: returned ids ⊂ probed cells)."""
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.embed import (
        Md5BowEmbedder,
        embed,
    )
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans.llmops import (
        t06_doc_chunking,
    )
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans.pipeline_extra import (
        _P09B_CELLS,
        _P09B_DIM,
        _P09B_NPROBE,
        _RAG_QUERY_TEXT,
        p09b_rag_query_exact,
    )

    chunks = t06_doc_chunking(spark, SF)
    vecs = (
        embed(
            chunks,
            text_col="chunk_text",
            embedder_factory=Md5BowEmbedder,
            dim=_P09B_DIM,
            on_error="fail",
        )
        .select(
            (F.col("doc_id") * 100_000 + F.col("chunk_idx")).alias("vec_id"),
            "embedding",
        )
        .collect()
    )
    import hashlib

    by_id = {r.vec_id: [int(x) for x in r.embedding] for r in vecs}
    seeds = sorted(
        by_id,
        key=lambda v: (hashlib.md5(f"p09bc:{v}".encode()).hexdigest(), v),
    )[:_P09B_CELLS]
    cents = [by_id[s] for s in seeds]

    def l2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    def assign(v):
        return min(range(_P09B_CELLS), key=lambda c: (l2(v, cents[c]), c))

    qvec = [int(x) for x in Md5BowEmbedder(_P09B_DIM).embed_batch([_RAG_QUERY_TEXT])[0]]
    probed = set(
        sorted(range(_P09B_CELLS), key=lambda c: (l2(qvec, cents[c]), c))[
            :_P09B_NPROBE
        ]
    )
    for r in p09b_rag_query_exact(spark, SF).collect():
        assert assign(by_id[r.vec_id]) in probed
