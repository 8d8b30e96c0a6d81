"""Rows-only accountability: every catalog entry WITHOUT a DuckDB
oracle must carry an explicit justification here — either it computes
an engine-specific sketch (no portable exact answer exists), its output
depends on micro-batch boundaries (no batch-SQL equivalent), or it is
the trained/UDF production sibling of a named HASH-EXACT twin that
value-certifies the same serving dataflow with seeded artifacts (the
s20b recipe). A new @query with oracle=None that is not registered here
fails, so rows-only coverage can never silently grow; a registered twin
that loses its oracle (or disappears) fails too."""

from __future__ import annotations

from real_time_genai_embeddings_for_rag_with_apache_flink_spark import plans

# name -> ("sketch" | "boundary" | ("twin", certified_entry))
ROWS_ONLY_JUSTIFICATION: dict[str, object] = {
    # engine-specific sketches by design: the exact-answer siblings are
    # oracle-gated (q13/q36/q69's exact pre-aggregates, w12), and the
    # sketch rows pin error bounds in their own pytest files
    "q13b_approx_distinct": "sketch",
    "q36b_approx_percentiles": "sketch",
    "q69_datasketches": "sketch",
    "q72_theta_setops": "sketch",
    "w12b_sketch_wau": "sketch",
    # output depends on where micro-batch boundaries fall (dedup scope
    # = watermark-bounded state at arrival time); batch SQL has no
    # equivalent, invariants pinned in tests/test_streaming_semantics.py
    "st17_dedup_within_watermark": "boundary",
    # trained / UDF / iterative production rows, each value-certified
    # by a seeded or unrolled hash-exact twin over the SAME dataflow
    "p01_pipeline_sink_docs": ("twin", "st31_opensearch_protocol_sink"),
    "p02_flagship_retrieval": ("twin", "p02b_flagship_retrieval_exact"),
    "p03_embed_distinct": ("twin", "p03b_embed_distinct_exact"),
    "p09_rag_query": ("twin", "p09b_rag_query_exact"),
    "s05_ivf_search": ("twin", "s05b_ivf_seeded"),
    "s06_kmeans_cells": ("twin", "s05b_ivf_seeded"),
    "d14_semantic_dedup": ("twin", "d34_semantic_dedup_seeded"),
    "d32_dup_graph_pagerank": ("twin", "d32b_pagerank_fixed_point"),
    "s09_product_quantization": ("twin", "s09b_pq_seeded"),
    "s10_ivfpq_search": ("twin", "s20b_ivfadc_seeded"),
    "s20_ivfpq_refined": ("twin", "s20b_ivfadc_seeded"),
    "s21_pca_projection": ("twin", "s22b_projection_ann_seeded"),
    "s22_pca_ann": ("twin", "s22b_projection_ann_seeded"),
    "st05_stream_embed_pipeline": ("twin", "p02b_flagship_retrieval_exact"),
    "t22_bpe_merge_learning": ("twin", "t27_bpe_training_exact"),
    "t22b_bpe_vocab_local": ("twin", "t27_bpe_training_exact"),
    "t23_bpe_tokenize": ("twin", "t23b_bpe_tokenize_exact"),
}


def test_every_rows_only_entry_is_justified():
    specs = plans.all_specs()
    rows_only = {n for n, s in specs.items() if not s.oracle}
    assert rows_only == set(ROWS_ONLY_JUSTIFICATION), (
        "rows-only set drifted: "
        f"unjustified={sorted(rows_only - set(ROWS_ONLY_JUSTIFICATION))}, "
        f"stale={sorted(set(ROWS_ONLY_JUSTIFICATION) - rows_only)}"
    )


def test_every_named_twin_is_hash_exact_and_exists():
    specs = plans.all_specs()
    for name, why in ROWS_ONLY_JUSTIFICATION.items():
        if isinstance(why, tuple):
            kind, twin = why
            assert kind == "twin"
            assert twin in specs, f"{name}: twin {twin} missing"
            assert specs[twin].oracle, (
                f"{name}: twin {twin} is itself rows-only — it certifies "
                "nothing"
            )
