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
# entries only. Round-11 window (the r10 verdict's directive, executing
# the rotation plan written in round 10): the cross-round union's
# stalest cohort is the 50 rows last checked in r06 — exactly one
# window — so the entries NEW this round (never driver-checked: s05b
# seeded IVF, p02b exact flagship retrieval, st29
# transformWithStateInPandas, d32b fixed-point PageRank, p03b exact
# embed_distinct, p09b exact end-to-end RAG, st30 Kinesis protocol
# ingest, st31 OpenSearch protocol sink, t27 exact BPE training) plus
# m03, whose r09 row was rows-only and whose oracle was upgraded to
# hash-exact this round (r10 verdict #4), displace the ten
# cheapest-to-defer r06 rows (q45/q46/q47/q48/q32/q33/q71/q28/q73/q70
# — pure scalar-function/relational entries with six-round green
# histories, their operator families still covered by sibling window
# rows, e.g. q67 variant JSON stays for q28, q24/q65 strings for q70),
# which carry to round 12. After this round the union's stalest rows
# are those ten (r06); everything else is r07+.
DRIVER_WINDOW: list[str] = [
    "d20_lsh_bucket_audit",
    "d21_scalable_components",
    "d22_seed_reachability",
    "d23_editdist_verify",
    "d24_lsh_recall_audit",
    "d25_cross_source_matrix",
    "d26_passage_provenance",
    "d27_prefix_filter_join",
    "d28_lsh_config_advisor",
    "m05_payload_phash_dedup",
    "p09_rag_query",
    "p10_training_manifest",
    "p11_partitioned_layout",
    "p12_schema_evolution",
    "p13_bucketed_join",
    "p14_partition_backfill",
    "q44_window_navigation",
    "q67_variant_json",
    "q68_lateral_join",
    "q69_datasketches",
    "q72_theta_setops",
    "s15_knn_graph",
    "s17_gemm_knn",
    "s18_filtered_ann",
    "s19_embedding_health",
    "st14_stream_incremental_dedup",
    "st15_stream_index_maintenance",
    "st16_stream_semi_join",
    "st17_dedup_within_watermark",
    "st18_stream_knn_serving",
    "st19_stream_ohlc",
    "t19_segment_dedup_clean",
    "t20_heavy_hitter_sketch",
    "t21_mixture_allocation",
    "u04_python_udtf",
    "w10_gap_fill_forward",
    "w11_ewma_smoothing",
    "w12_rolling_active_users",
    "w13_peak_concurrency",
    "w14_ohlc_downsample",
    "s05b_ivf_seeded",
    "p02b_flagship_retrieval_exact",
    "st29_stream_transform_with_state",
    "d32b_pagerank_fixed_point",
    "p03b_embed_distinct_exact",
    "p09b_rag_query_exact",
    "st30_kinesis_protocol_ingest",
    "st31_opensearch_protocol_sink",
    "t27_bpe_training_exact",
    "m03_media_features",
]

set_priority(DRIVER_WINDOW)

__all__ = ["QuerySpec", "all_specs", "get_spec", "query", "set_priority", "DRIVER_WINDOW"]
