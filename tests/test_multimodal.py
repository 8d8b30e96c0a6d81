"""m06 cross-modal retrieval: the two-tower shared-space contract and
an EXACT pin of the whole pipeline (text embedder + media embedder +
cosine + per-query top-k) against a dense numpy reference — the
rows-only catalog entry's correctness gate."""

from __future__ import annotations

import math
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from conftest import SF_SMOKE

from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.multimodal import (
    DeterministicMediaEmbedder,
    attach_fake_payload,
    embed_media,
)
from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans import get_spec
from real_time_genai_embeddings_for_rag_with_apache_flink_spark.sources.batch import (
    load_table,
)


def _ref_embed(text: str, dim: int = 64) -> np.ndarray:
    """Dense replica of operators/embed.DeterministicEmbedder,
    including the float32 storage cast Spark's array<float> applies."""
    vec = np.zeros(dim, dtype=np.float64)
    for tok in text.lower().split():
        h = zlib.crc32(tok.encode("utf-8"))
        vec[h % dim] += 1.0 + (h >> 16) % 7
    n = float(np.linalg.norm(vec))
    if n > 0.0:
        vec /= n
    return vec.astype(np.float32)


def _round_half_up6(x: float) -> float:
    # Spark F.round is HALF_UP (away from zero); np.round is half-even
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5), x) / 1e6


def test_media_embedder_shares_text_space():
    """The CLIP-style contract: encoding a payload lands exactly where
    encoding its text does — cross-modal cosine is meaningful."""
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.embed import (
        DeterministicEmbedder,
    )

    text = "an image caption with several tokens"
    t = DeterministicEmbedder(64).embed_batch([text, None])
    m = DeterministicMediaEmbedder(64).embed_batch([text.encode("utf-8"), None])
    assert m[0] == t[0]
    assert m[1] is None and t[1] is None


def test_embed_media_real_codec_is_gated(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    media = attach_fake_payload(docs)
    with pytest.raises(Exception) as ei:
        embed_media(media, real_codec=True).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_m06_matches_dense_numpy_reference(spark):
    """Recall 1.0 vs the reference: the catalog entry's (q_id, doc_id,
    rnk) triples — and the rounded sims — equal a dense numpy replay of
    both embedders, cosine, HALF_UP rounding, and (sim desc, doc_id)
    tie-broken top-5 with self-matches excluded."""
    rows = (
        load_table(spark, SF_SMOKE, "documents")
        .filter(F.length("text") > 0)
        .select("doc_id", "text")
        .collect()
    )
    vecs = {r.doc_id: _ref_embed(r.text) for r in rows}

    expected = {}
    q_ids = [d for d in vecs if d % 100 == 0]
    for q in q_ids:
        qv = vecs[q].astype(np.float64)
        qn = float(np.linalg.norm(qv))
        scored = []
        for d, v in vecs.items():
            if d == q:
                continue
            dv = v.astype(np.float64)
            denom = qn * float(np.linalg.norm(dv))
            if denom == 0.0:
                continue  # NULL sim ranks last; never reaches top-5 here
            scored.append((_round_half_up6(float(dv @ qv) / denom), d))
        scored.sort(key=lambda t: (-t[0], t[1]))
        for rnk, (sim, d) in enumerate(scored[:5], start=1):
            expected[(q, d)] = (rnk, sim)

    got = {
        (r.q_id, r.doc_id): (r.rnk, r.sim)
        for r in get_spec("m06_crossmodal_retrieval")
        .build(spark, SF_SMOKE)
        .collect()
    }
    assert set(got) == set(expected)
    for k in expected:
        assert got[k][0] == expected[k][0], (k, got[k], expected[k])
        assert abs(got[k][1] - expected[k][1]) < 1e-9, (k, got[k], expected[k])
