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
