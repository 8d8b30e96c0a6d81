"""d29 bloom decontamination vs d12's exact broadcast-dictionary pass.

Bloom semantics to pin: NEVER a false negative (every gram d12 flags,
d29 flags), false positives only ever ADD flagged grams, and at the
shipped sizing (m=2^18, k=4) the inflation stays small enough that the
>=3 contamination verdicts barely move."""

from __future__ import annotations

from conftest import SF_SMOKE

from real_time_genai_embeddings_for_rag_with_apache_flink_spark import plans


def test_bloom_flags_are_a_superset_of_exact_flags(spark):
    exact = {
        r.doc_id: (r.n_grams, r.n_eval_shared, r.contaminated)
        for r in plans.get_spec("d12_decontamination")
        .build(spark, SF_SMOKE)
        .collect()
    }
    bloom = {
        r.doc_id: (r.n_grams, r.n_bloom_flagged, r.contaminated_bloom)
        for r in plans.get_spec("d29_bloom_decontamination")
        .build(spark, SF_SMOKE)
        .collect()
    }
    assert set(bloom) == set(exact)

    total_exact = total_bloom = 0
    for doc_id, (n_grams, n_exact, contam) in exact.items():
        bg, n_flag, bloom_contam = bloom[doc_id]
        assert bg == n_grams
        # no false negatives, ever
        assert n_flag >= n_exact, (doc_id, n_flag, n_exact)
        if contam:
            assert bloom_contam, f"bloom missed contaminated doc {doc_id}"
        total_exact += n_exact
        total_bloom += n_flag

    # FP inflation bound: at m=2^18 / k=4 with this eval mass the false
    # positive rate is well under 5% of probed grams; corpus-wide
    # flagged count must not inflate beyond 1.5x the exact count + a
    # small absolute allowance for tiny corpora.
    assert total_bloom <= total_exact * 1.5 + 50, (total_bloom, total_exact)

    # and the verdict flips only ever in the conservative direction
    flipped = [
        d
        for d in exact
        if bloom[d][2] and not exact[d][2]
    ]
    assert len(flipped) <= max(2, len(exact) // 50), flipped
