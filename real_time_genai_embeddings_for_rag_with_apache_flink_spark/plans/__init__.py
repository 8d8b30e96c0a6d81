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
# entries only. Round-10 window (the r9 verdict's directive, executing
# the rotation plan written in round 9): the 45 rows whose latest
# driver row is r05 LEAD (after this round nothing in the cross-round
# union is older than r06), then the entries new this round (never
# driver-checked: s20b seeded IVFADC+R, d34 seeded SemDeDup, t26
# curriculum ordering, s28 hard-negative mining — all hash-exact by
# construction), then m06, whose r09 row was rows-only and whose
# oracle was upgraded to hash-exact this round (r9 verdict #5), so its
# certification needs re-recording.
DRIVER_WINDOW: list[str] = [
    "d15_containment_dupes",
    "d16_canonical_selection",
    "d17_substring_dedup",
    "d18_minhash_estimate_audit",
    "d19_component_size_histogram",
    "p06_orc_roundtrip",
    "p07_csv_roundtrip",
    "p08_corpus_materialization",
    "q01_pricing_summary",
    "q02_filter_projection",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q06_forecast_revenue",
    "q07_join_left_nulls",
    "q08_join_right",
    "q09_join_full_outer",
    "q10_join_semi",
    "q11_join_anti",
    "q12_cross_join",
    "q13_distinct_agg",
    "q13b_approx_distinct",
    "q14_rollup",
    "q15_cube",
    "q16_grouping_sets",
    "q17_window_topk_per_group",
    "q18_window_analytics",
    "q19_window_range_frame",
    "q20_sort_limit",
    "q21_union_all",
    "q22_intersect",
    "q23_except_all",
    "q24_string_functions",
    "q25_datetime_functions",
    "q26_conditional_null",
    "q30_theta_range_join",
    "q31_asof_join",
    "q36b_approx_percentiles",
    "q65_string_agg",
    "q66_window_distribution",
    "s13_range_search",
    "s14_mmr_rerank",
    "s16_knn_classification",
    "st13_stream_outer_interval_join",
    "t17_dsir_weights",
    "t18_zipf_vocabulary",
    "s20b_ivfadc_seeded",
    "d34_semantic_dedup_seeded",
    "t26_curriculum_order",
    "s28_hard_negative_mining",
    "m06_crossmodal_retrieval",
]

set_priority(DRIVER_WINDOW)

__all__ = ["QuerySpec", "all_specs", "get_spec", "query", "set_priority", "DRIVER_WINDOW"]
