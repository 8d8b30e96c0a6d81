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
# entries only. Round-4 window: the five round-3 reds (the streaming
# event-time decode fix + p01's array serialization), the five
# operators new this round, then the 40 entries that have never had a
# driver row (rounds 2+3 covered the other 97). Already-driver-green
# entries sort last, in registration order.
DRIVER_WINDOW: list[str] = [
    # round-3 reds, fixed this round
    "p01_pipeline_sink_docs",
    "st01_stream_tumbling_complete",
    "st02_stream_watermark_append",
    "st07_stream_stream_join",
    "st08_stream_session_append",
    # new in round 4
    "s13_range_search",
    "s14_mmr_rerank",
    "t15_bigram_lm_quality",
    "t16_source_datacard",
    "d15_containment_dupes",
    # never driver-checked before this round
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
    "q64_histogram",
    "t12_vocab_heavy_hitters",
    "t13_sequence_packing",
    "d13_training_shards",
]

set_priority(DRIVER_WINDOW)

__all__ = ["QuerySpec", "all_specs", "get_spec", "query", "set_priority", "DRIVER_WINDOW"]
