from .registry import QuerySpec, all_specs, get_spec, query, set_priority

# Importing these modules populates the registry.
from . import catalog  # noqa: E402,F401
from . import tpch_extra  # noqa: E402,F401
from . import llmops  # noqa: E402,F401
from . import pipeline_extra  # noqa: E402,F401
from . import windows  # noqa: E402,F401
from . import streaming_queries  # noqa: E402,F401
from . import udfs  # noqa: E402,F401
from . import reshape  # noqa: E402,F401
from . import subqueries  # noqa: E402,F401
from . import curation  # noqa: E402,F401
from . import retrieval  # noqa: E402,F401

# The external correctness driver records rows for the FIRST 50 catalog
# entries only (CORRECTNESS_r02 proved queries 1-50 of registration
# order and nothing else). Round-3 window: the three round-2 reds
# (q27/q29/q54, now dtype/serialization-pinned) plus the LLM-pipeline,
# text, similarity, streaming, event-time-window, UDF, multimodal,
# pivot and correlated-subquery entries that have never had a driver
# row. Everything from q51 down in this list is the round-4 rotation;
# the 47 already-driver-green catalog/tpch entries sort last.
DRIVER_WINDOW: list[str] = [
    # round-2 reds, fixed this round
    "q27_math_functions",
    "q29_array_functions",
    "q54_priority_lateness",
    # dedup family
    "d01_exact_dedup",
    "d02_ngram_jaccard",
    "d03_minhash_signatures",
    "d04_minhash_lsh_pairs",
    "d05_simhash",
    "d06_simhash_hamming_pairs",
    "d07_hash_sample",
    "d08_dup_components",
    "d09_stratified_sample",
    "d10_lsh_verified_dupes",
    # text analysis
    "t01_text_stats",
    "t02_language_id",
    "t03_quality_scores",
    "t04_bpe_token_count",
    "t05_rolling_hash",
    "t06_doc_chunking",
    "t07_pii_redaction",
    "t08_corpus_mixture",
    # similarity / ANN
    "s01_topk_cosine",
    "s02_knn_join",
    "s03_embedding_near_dup",
    "s04_label_centroids",
    "s05_ivf_search",
    "s07_scalar_quantization",
    "s08_hyperplane_lsh_buckets",
    # reference-pipeline twins
    "p01_pipeline_sink_docs",
    "p02_flagship_retrieval",
    # streaming (real micro-batch runs)
    "st01_stream_tumbling_complete",
    "st02_stream_watermark_append",
    "st03_stream_dedup",
    "st04_stream_filter_project",
    "st06_stateful_user_totals",
    "st07_stream_stream_join",
    "st08_stream_session_append",
    "st09_stream_static_join",
    "st10_foreachbatch_upsert",
    # event-time windows
    "w01_tumbling_window",
    "w02_sliding_window",
    "w03_session_window",
    "w04_interval_join",
    # UDF / UDAF / UDTF
    "u01_grouped_agg_udaf",
    "u02_mapinpandas_tokens",
    "u03_grouped_map_zscore",
    # multimodal
    "m01_multimodal_decode",
    "m02_frame_sampling",
    # pivot + correlated subquery
    "q34_pivot",
    "q40_correlated_scalar",
    # ---- entry 51 onward: round-4 rotation (never driver-checked) ----
    "w05_windowed_topk_users",
    "w06_time_weighted_avg",
    "w07_event_funnel",
    "w08_subsequence_search",
    "w09_retention_cohorts",
    "st05_stream_embed_pipeline",
    "s06_kmeans_cells",
    "s09_product_quantization",
    "p03_embed_distinct",
    "m03_media_features",
    "m04_media_resize",
    "q34b_pivot_native",
    "q35_unpivot",
    "q36_percentiles",
    "q36b_approx_percentiles",
    "r01_salted_join",
    "r02_salted_aggregation",
    "q41_min_price_line",
    "q42_rich_inactive_customers",
    "q43_large_volume_orders",
    "q61_important_parts",
    "q62_returned_items",
    "q63_customer_distribution",
    "t09_curation_rules",
    "t10_repetition_stats",
    "d11_repeated_ngrams",
    "d12_decontamination",
    "s10_ivfpq_search",
    "t11_bm25_retrieval",
    "s11_hybrid_rrf",
    "t14_source_caps",
    "d14_semantic_dedup",
    "s12_random_projection",
    "p04_python_datasource",
    "st12_python_stream_source",
    "p05_vecdir_sink_roundtrip",
]

set_priority(DRIVER_WINDOW)

__all__ = ["QuerySpec", "all_specs", "get_spec", "query", "set_priority", "DRIVER_WINDOW"]
