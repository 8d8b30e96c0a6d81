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
# entries only. Round-12 window (executing the rotation plan written in
# round 11, tests/test_driver_window.py "ROUND-12 PLAN"): after
# CORRECTNESS_r11 the union's stalest rows are the ten rows deferred
# from the r11 window (last checked r06: q45-q48, q32, q33, q71, q28,
# q73, q70), then the 50-row r07 cohort. Those ten lead; the r07 cohort
# follows; and the three entries NEW this round (never driver-checked:
# s09b seeded flat PQ, t23b exact learned-merge tokenization, m03b PNG
# real-decode features, s22b seeded projection-ANN, st32 the executed
# Kinesis PRODUCER round-trip, st33 the reference topology wire-to-
# wire) take the final slots by displacing the 16 cheapest-to-defer
# r07 rows (the 11
# pure-relational TPC-H-family entries q49-q60 — seven-round green,
# their join/aggregate families covered in-window by q32/q33/q71 and
# the d/s/st/t rows — plus t24_temperature_mixture, whose mixture
# sibling t08 stays in-window and t21 was checked r11,
# w01_tumbling_window, whose sibling w02 stays and whose streaming
# twin st01 was checked r11, d07_hash_sample, whose sampling siblings
# d09 and st20 stay in-window, and s07_scalar_quantization, whose
# quantization siblings s09b (new, in-window) and s20b (r11-checked)
# cover the family, and t05_rolling_hash, whose content-hash siblings
# d01/d03 stay in-window and d17/t19 were checked r11), which carry to
# round 13 as its lead.
DRIVER_WINDOW: list[str] = [
    # -- the ten r06-stale rows deferred from the r11 window ----------
    "q45_map_functions",
    "q46_try_functions",
    "q47_hash_bit_functions",
    "q48_null_semantics",
    "q32_in_subquery",
    "q33_scalar_subquery",
    "q71_filtered_aggregates",
    "q28_json_functions",
    "q73_mode_median",
    "q70_collation",
    # -- the r07 cohort minus the 16 declared round-13 deferrals ------
    "d01_exact_dedup",
    "d02_ngram_jaccard",
    "d03_minhash_signatures",
    "d09_stratified_sample",
    "d29_bloom_decontamination",
    "p02_flagship_retrieval",
    "s01_topk_cosine",
    "s02_knn_join",
    "s03_embedding_near_dup",
    "s04_label_centroids",
    "s05_ivf_search",
    "s08_hyperplane_lsh_buckets",
    "st03_stream_dedup",
    "st04_stream_filter_project",
    "st06_stateful_user_totals",
    "st09_stream_static_join",
    "st10_foreachbatch_upsert",
    "st14b_stream_verified_neardups",
    "st20_stream_quota_sampling",
    "t01_text_stats",
    "t02_language_id",
    "t03_quality_scores",
    "t04_bpe_token_count",
    "t06_doc_chunking",
    "t07_pii_redaction",
    "t08_corpus_mixture",
    "t22_bpe_merge_learning",
    "t23_bpe_tokenize",
    "u01_grouped_agg_udaf",
    "u02_mapinpandas_tokens",
    "u03_grouped_map_zscore",
    "w02_sliding_window",
    "w12b_sketch_wau",
    "w13b_peak_concurrency_twophase",
    # -- new this round (never driver-checked) ------------------------
    "s09b_pq_seeded",
    "t23b_bpe_tokenize_exact",
    "m03b_png_features",
    "s22b_projection_ann_seeded",
    "st32_kinesis_producer_roundtrip",
    "st33_reference_topology_wire_to_wire",
]

set_priority(DRIVER_WINDOW)

__all__ = ["QuerySpec", "all_specs", "get_spec", "query", "set_priority", "DRIVER_WINDOW"]
