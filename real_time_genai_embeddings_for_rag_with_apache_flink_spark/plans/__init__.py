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
# entries only. Round-9 window (the r8 verdict's directive, executing
# the rotation plan written in round 8): the 33 r04-stale rows deferred
# from round 8 LEAD (after this round nothing in the cross-round union
# is older than r05), then the entries new this round (never
# driver-checked: s27 ANN quality certification, m06 cross-modal
# retrieval, st25 streaming MaxSim serving, w20/st26 transition-matrix
# batch/stream pair, w21 time-to-conversion, d33 cross-source dup
# matrix, st27 streaming quality gate, w22 CUSUM drift, p22 column
# statistics, w23 dwell time, st28 incremental dup components), then 5
# of the 50 rows whose latest driver row is r05 (the remaining 45 r05
# rows lead the round-10 window — see DEFERRED_TO_R10 in
# tests/test_driver_window.py).
DRIVER_WINDOW: list[str] = [
    "d11_repeated_ngrams",
    "d12_decontamination",
    "d13_training_shards",
    "m03_media_features",
    "p04_python_datasource",
    "r01_salted_join",
    "q34b_pivot_native",
    "q61_important_parts",
    "q62_returned_items",
    "q63_customer_distribution",
    "q35_unpivot",
    "q36_percentiles",
    "q41_min_price_line",
    "q42_rich_inactive_customers",
    "q43_large_volume_orders",
    "q64_histogram",
    "t12_vocab_heavy_hitters",
    "t13_sequence_packing",
    "w09_retention_cohorts",
    "t14_source_caps",
    "t15_bigram_lm_quality",
    "t16_source_datacard",
    "w05_windowed_topk_users",
    "w06_time_weighted_avg",
    "w07_event_funnel",
    "w08_subsequence_search",
    "t09_curation_rules",
    "t10_repetition_stats",
    "t11_bm25_retrieval",
    "s11_hybrid_rrf",
    "s12_random_projection",
    "m04_media_resize",
    "r02_salted_aggregation",
    "s27_ann_quality_certification",
    "m06_crossmodal_retrieval",
    "st25_stream_maxsim_serving",
    "w20_event_transition_matrix",
    "w21_time_to_conversion",
    "d33_cross_source_dup_matrix",
    "st26_stream_transition_matrix",
    "st27_stream_quality_gate",
    "w22_cusum_drift",
    "p22_column_statistics",
    "w23_state_dwell_time",
    "st28_stream_dup_components",
    "d04_minhash_lsh_pairs",
    "d05_simhash",
    "d06_simhash_hamming_pairs",
    "d08_dup_components",
    "d10_lsh_verified_dupes",
]

set_priority(DRIVER_WINDOW)

__all__ = ["QuerySpec", "all_specs", "get_spec", "query", "set_priority", "DRIVER_WINDOW"]
