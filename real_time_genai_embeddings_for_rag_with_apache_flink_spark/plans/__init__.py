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
# entries only. Round-14 window (executing the rotation plan written in
# round 13, tests/test_driver_window.py "ROUND-14 PLAN"): after
# CORRECTNESS_r13 the union's stalest rows are the 22 r08 rows deferred
# from the r13 window, then the 48-row r09 cohort. The 22 lead; 23 of
# the r09 cohort follow; and the five entries NEW this round (never
# driver-checked: s30 the graph-beam ANN serving twin, st37 the
# exactly-once live-reshard wire certification, st38 the streaming
# binary-Hamming index maintenance, st39 the streaming graph-index
# maintenance, d35 exact duplicated-span detection) displace the
# cheapest-to-defer r09 rows — 25 r09 rows carry to round 15 as its
# lead. Deferral reasoning
# per row in tests/test_driver_window.py DEFERRED_TO_R15.
DRIVER_WINDOW: list[str] = [
    # -- the 22 r08-stale rows deferred from the r13 window -----------
    "d14_semantic_dedup",
    "m01_multimodal_decode",
    "m02_frame_sampling",
    "q27_math_functions",
    "q29_array_functions",
    "q34_pivot",
    "q40_correlated_scalar",
    "q54_priority_lateness",
    "s06_kmeans_cells",
    "s09_product_quantization",
    "s10_ivfpq_search",
    "s24_hamming_width_advisor",
    "s20_ivfpq_refined",
    "s21_pca_projection",
    "s22_pca_ann",
    "st08_stream_session_append",
    "st24_stream_compaction",
    "t22b_bpe_vocab_local",
    "w15_rolling_zscore_anomaly",
    "w16_windowed_distinct_users",
    "w17_scd2_dimension_join",
    "w19_purchase_attribution",
    # -- the r09 cohort minus the 23 declared round-15 deferrals ------
    "d04_minhash_lsh_pairs",
    "d08_dup_components",
    "d10_lsh_verified_dupes",
    "d12_decontamination",
    "d33_cross_source_dup_matrix",
    "p04_python_datasource",
    "p22_column_statistics",
    "q35_unpivot",
    "q36_percentiles",
    "q41_min_price_line",
    "q64_histogram",
    "r01_salted_join",
    "s11_hybrid_rrf",
    "st26_stream_transition_matrix",
    "t09_curation_rules",
    "t10_repetition_stats",
    "t11_bm25_retrieval",
    "t12_vocab_heavy_hitters",
    "t13_sequence_packing",
    "t15_bigram_lm_quality",
    "w07_event_funnel",
    "w09_retention_cohorts",
    "w22_cusum_drift",
    # -- new this round (never driver-checked) ------------------------
    "s30_graph_beam_ann",
    "st37_reshard_exactly_once_wire",
    "st38_stream_hamming_index_maintenance",
    "st39_stream_graph_index_maintenance",
    "d35_exact_dup_spans",
]

set_priority(DRIVER_WINDOW)

__all__ = ["QuerySpec", "all_specs", "get_spec", "query", "set_priority", "DRIVER_WINDOW"]
