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
# entries only. Round-6 window: every operator that has never had a
# driver row (the 31 new since the r5 snapshot), then the STALEST
# entries — everything whose latest driver row predates the round-4/5
# seam and skew-guard refactors. 42 never-checked (31 from the first
# half of round 6 + 11 from the second) + the 8 oldest r02-checked
# entries fill the 50; q49-q53/q55-q60 and the 40 r03-stale
# entries lead the round-7 window.
DRIVER_WINDOW: list[str] = [
    # new this round (never driver-checked)
    "d20_lsh_bucket_audit",
    "p09_rag_query",
    "st14_stream_incremental_dedup",
    "d21_scalable_components",
    "d22_seed_reachability",
    "s15_knn_graph",
    "t19_segment_dedup_clean",
    "q67_variant_json",
    "st15_stream_index_maintenance",
    "q68_lateral_join",
    "t20_heavy_hitter_sketch",
    "p10_training_manifest",
    "u04_python_udtf",
    "m05_payload_phash_dedup",
    "d23_editdist_verify",
    "s17_gemm_knn",
    "st16_stream_semi_join",
    "q69_datasketches",
    "t21_mixture_allocation",
    "p11_partitioned_layout",
    "w10_gap_fill_forward",
    "q70_collation",
    "p12_schema_evolution",
    "d24_lsh_recall_audit",
    "s18_filtered_ann",
    "q71_filtered_aggregates",
    "st17_dedup_within_watermark",
    "d25_cross_source_matrix",
    "w11_ewma_smoothing",
    "d26_passage_provenance",
    "q72_theta_setops",
    "d27_prefix_filter_join",
    "p13_bucketed_join",
    "s19_embedding_health",
    "st18_stream_knn_serving",
    "q73_mode_median",
    "w12_rolling_active_users",
    "d28_lsh_config_advisor",
    "w13_peak_concurrency",
    "p14_partition_backfill",
    "w14_ohlc_downsample",
    "st19_stream_ohlc",
    # stalest: last driver-checked in r02
    "q28_json_functions",
    "q32_in_subquery",
    "q33_scalar_subquery",
    "q44_window_navigation",
    "q45_map_functions",
    "q46_try_functions",
    "q47_hash_bit_functions",
    "q48_null_semantics",
]

set_priority(DRIVER_WINDOW)

__all__ = ["QuerySpec", "all_specs", "get_spec", "query", "set_priority", "DRIVER_WINDOW"]
