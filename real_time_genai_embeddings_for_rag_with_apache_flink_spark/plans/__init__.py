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
# entries only. Round-8 window (the r7 verdict's directive): the 28
# entries new this round (never driver-checked) lead, then the 9
# refactor-immune rows deferred from round 7 (latest driver row r03),
# then 13 of the 46 rows whose latest driver row is r04. The 33 deferred
# r04 rows (d11/d12/d13/m03/m04/p04/q34b/q35/q36/q41/q42/q43/q61/q62/q63/q64/r01/
# r02/s11/s12/t09/t10/t11/t12/t13/t14/t15/t16/w05/w06/w07/w08/w09 —
# pivot/percentile/media/salted-join-agg/subquery/histogram/RRF/
# JL-projection/packing/cohort/window/caps/LM-quality/datacard/
# heavy-hitter/curation/repetition/BM25/raw-trigram/shard plans
# untouched by any refactor since r04) lead the round-9 window.
DRIVER_WINDOW: list[str] = [
    # new this round (never driver-checked)
    "t22b_bpe_vocab_local",
    "w15_rolling_zscore_anomaly",
    "st21_stream_zscore_anomaly",
    "s20_ivfpq_refined",
    "w16_windowed_distinct_users",
    "p15_snapshot_diff",
    "w17_scd2_dimension_join",
    "p16_cdc_apply",
    "d30_leakage_safe_split",
    "s21_pca_projection",
    "st22_stream_cdc_apply",
    "d31_weighted_sample",
    "w18_scd2_snapshot",
    "s22_pca_ann",
    "p17_data_quality_gate",
    "s23_binary_hamming_ann",
    "p18_incremental_view_maintenance",
    "p19_zorder_clustering",
    "d32_dup_graph_pagerank",
    "w19_purchase_attribution",
    "s24_hamming_width_advisor",
    "st23_stream_ivm",
    "s25_retrieval_eval",
    "p20_compaction_planner",
    "s26_maxsim_late_interaction",
    "t25_source_divergence",
    "st24_stream_compaction",
    "p21_k_anonymity_audit",
    # stalest: last driver-checked in r03 (deferred from round 7)
    "m01_multimodal_decode",
    "m02_frame_sampling",
    "q27_math_functions",
    "q29_array_functions",
    "q34_pivot",
    "q40_correlated_scalar",
    "q54_priority_lateness",
    "w03_session_window",
    "w04_interval_join",
    # next-stalest: last driver-checked in r04
    "d14_semantic_dedup",
    "p01_pipeline_sink_docs",
    "p03_embed_distinct",
    "p05_vecdir_sink_roundtrip",
    "s06_kmeans_cells",
    "s09_product_quantization",
    "s10_ivfpq_search",
    "st01_stream_tumbling_complete",
    "st02_stream_watermark_append",
    "st05_stream_embed_pipeline",
    "st07_stream_stream_join",
    "st08_stream_session_append",
    "st12_python_stream_source",
]

set_priority(DRIVER_WINDOW)

__all__ = ["QuerySpec", "all_specs", "get_spec", "query", "set_priority", "DRIVER_WINDOW"]
