"""The external driver records correctness rows for the FIRST 50
catalog entries only (observed: CORRECTNESS_r02..r06 each held exactly
the first 50 of the priority order). These tests pin the round-7
rotation (the r6 verdict's directive): the eight operators new this
round lead (never driver-checked), then EVERY entry whose latest driver
row is r02 (11), then the r03-stale entries — all predating the
seam/skew-guard/state-partition refactors — except the nine
refactor-immune plans the window cannot fit (q27/q29/q34/q40/q54
scalar/pivot/subquery + m01/m02 multimodal + w03/w04 native
session-window / interval-join), which lead the round-8 window."""

from __future__ import annotations

from real_time_genai_embeddings_for_rag_with_apache_flink_spark import plans

DRIVER_WINDOW_SIZE = 50

# Names with a green driver row in CORRECTNESS_r02 (hash_match true).
R02_GREEN = {
    "q01_pricing_summary", "q02_filter_projection", "q03_shipping_priority",
    "q05_local_supplier_volume", "q06_forecast_revenue", "q07_join_left_nulls",
    "q08_join_right", "q09_join_full_outer", "q10_join_semi", "q11_join_anti",
    "q12_cross_join", "q13_distinct_agg", "q14_rollup", "q15_cube",
    "q16_grouping_sets", "q17_window_topk_per_group", "q18_window_analytics",
    "q19_window_range_frame", "q20_sort_limit", "q21_union_all",
    "q22_intersect", "q23_except_all", "q24_string_functions",
    "q25_datetime_functions", "q26_conditional_null", "q28_json_functions",
    "q30_theta_range_join", "q31_asof_join", "q32_in_subquery",
    "q33_scalar_subquery", "q44_window_navigation", "q45_map_functions",
    "q46_try_functions", "q47_hash_bit_functions", "q48_null_semantics",
    "q49_priority_late_orders", "q50_argmax_aggregates", "q51_volume_shipping",
    "q52_market_share", "q53_product_profit", "q55_promo_revenue",
    "q56_top_supplier", "q57_supplier_part_counts", "q58_disjunctive_join",
    "q59_excess_volume_suppliers", "q60_waiting_orders",
}

# Green in CORRECTNESS_r03 (hash_match true, or rows-only recorded cleanly).
R03_GREEN = {
    "q27_math_functions", "q29_array_functions", "q54_priority_lateness",
    "d01_exact_dedup", "d02_ngram_jaccard", "d03_minhash_signatures",
    "d04_minhash_lsh_pairs", "d05_simhash", "d06_simhash_hamming_pairs",
    "d07_hash_sample", "d08_dup_components", "d09_stratified_sample",
    "d10_lsh_verified_dupes", "t01_text_stats", "t02_language_id",
    "t03_quality_scores", "t04_bpe_token_count", "t05_rolling_hash",
    "t06_doc_chunking", "t07_pii_redaction", "t08_corpus_mixture",
    "s01_topk_cosine", "s02_knn_join", "s03_embedding_near_dup",
    "s04_label_centroids", "s07_scalar_quantization",
    "s08_hyperplane_lsh_buckets", "st03_stream_dedup",
    "st04_stream_filter_project", "st06_stateful_user_totals",
    "st09_stream_static_join", "st10_foreachbatch_upsert",
    "w01_tumbling_window", "w02_sliding_window", "w03_session_window",
    "w04_interval_join", "u01_grouped_agg_udaf", "u02_mapinpandas_tokens",
    "u03_grouped_map_zscore", "m01_multimodal_decode", "m02_frame_sampling",
    "q34_pivot", "q40_correlated_scalar",
}

# Green in CORRECTNESS_r04 (hash_match true, or rows-only recorded cleanly).
R04_GREEN = {
    "p01_pipeline_sink_docs", "st01_stream_tumbling_complete",
    "st02_stream_watermark_append", "st07_stream_stream_join",
    "st08_stream_session_append", "s13_range_search", "s14_mmr_rerank",
    "t15_bigram_lm_quality", "t16_source_datacard", "d15_containment_dupes",
    "w05_windowed_topk_users", "w06_time_weighted_avg", "w07_event_funnel",
    "w08_subsequence_search", "w09_retention_cohorts",
    "st05_stream_embed_pipeline", "s06_kmeans_cells",
    "s09_product_quantization", "p03_embed_distinct", "m03_media_features",
    "m04_media_resize", "q34b_pivot_native", "q35_unpivot",
    "q36_percentiles", "q36b_approx_percentiles", "r01_salted_join",
    "r02_salted_aggregation", "q41_min_price_line",
    "q42_rich_inactive_customers", "q43_large_volume_orders",
    "q61_important_parts", "q62_returned_items", "q63_customer_distribution",
    "t09_curation_rules", "t10_repetition_stats", "d11_repeated_ngrams",
    "d12_decontamination", "s10_ivfpq_search", "t11_bm25_retrieval",
    "s11_hybrid_rrf", "t14_source_caps", "d14_semantic_dedup",
    "s12_random_projection", "p04_python_datasource",
    "st12_python_stream_source", "p05_vecdir_sink_roundtrip",
    "q64_histogram", "t12_vocab_heavy_hitters", "t13_sequence_packing",
    "d13_training_shards",
}

# Green in CORRECTNESS_r05 (47 hash-green + 3 rows-only-by-design).
R05_GREEN = {
    "d04_minhash_lsh_pairs", "d05_simhash", "d06_simhash_hamming_pairs",
    "d08_dup_components", "d10_lsh_verified_dupes", "d15_containment_dupes",
    "d16_canonical_selection", "d17_substring_dedup",
    "d18_minhash_estimate_audit", "d19_component_size_histogram",
    "p06_orc_roundtrip", "p07_csv_roundtrip", "p08_corpus_materialization",
    "q01_pricing_summary", "q02_filter_projection", "q03_shipping_priority",
    "q05_local_supplier_volume", "q06_forecast_revenue", "q07_join_left_nulls",
    "q08_join_right", "q09_join_full_outer", "q10_join_semi", "q11_join_anti",
    "q12_cross_join", "q13_distinct_agg", "q13b_approx_distinct", "q14_rollup",
    "q15_cube", "q16_grouping_sets", "q17_window_topk_per_group",
    "q18_window_analytics", "q19_window_range_frame", "q20_sort_limit",
    "q21_union_all", "q22_intersect", "q23_except_all", "q24_string_functions",
    "q25_datetime_functions", "q26_conditional_null", "q30_theta_range_join",
    "q31_asof_join", "q36b_approx_percentiles", "q65_string_agg",
    "q66_window_distribution", "s13_range_search", "s14_mmr_rerank",
    "s16_knn_classification", "st13_stream_outer_interval_join",
    "t17_dsir_weights", "t18_zipf_vocabulary",
}

# Green in CORRECTNESS_r06 (46 hash-green + 4 rows-only-by-design):
# the round-6 window — 42 never-checked entries + the 8 oldest
# r02-checked scalar-function/subquery rows.
R06_GREEN = {
    "d20_lsh_bucket_audit", "d21_scalable_components", "d22_seed_reachability",
    "d23_editdist_verify", "d24_lsh_recall_audit", "d25_cross_source_matrix",
    "d26_passage_provenance", "d27_prefix_filter_join",
    "d28_lsh_config_advisor", "m05_payload_phash_dedup", "p09_rag_query",
    "p10_training_manifest", "p11_partitioned_layout", "p12_schema_evolution",
    "p13_bucketed_join", "p14_partition_backfill", "q28_json_functions",
    "q32_in_subquery", "q33_scalar_subquery", "q44_window_navigation",
    "q45_map_functions", "q46_try_functions", "q47_hash_bit_functions",
    "q48_null_semantics", "q67_variant_json", "q68_lateral_join",
    "q69_datasketches", "q70_collation", "q71_filtered_aggregates",
    "q72_theta_setops", "q73_mode_median", "s15_knn_graph", "s17_gemm_knn",
    "s18_filtered_ann", "s19_embedding_health", "st14_stream_incremental_dedup",
    "st15_stream_index_maintenance", "st16_stream_semi_join",
    "st17_dedup_within_watermark", "st18_stream_knn_serving",
    "st19_stream_ohlc", "t19_segment_dedup_clean", "t20_heavy_hitter_sketch",
    "t21_mixture_allocation", "u04_python_udtf", "w10_gap_fill_forward",
    "w11_ewma_smoothing", "w12_rolling_active_users", "w13_peak_concurrency",
    "w14_ohlc_downsample",
}

ALL_GREEN = R02_GREEN | R03_GREEN | R04_GREEN | R05_GREEN | R06_GREEN

# Never driver-checked (new in round 7); MUST lead the round-7 window.
NEVER_CHECKED = (
    "st14b_stream_verified_neardups",
    "w12b_sketch_wau",
    "w13b_peak_concurrency_twophase",
    "t22_bpe_merge_learning",
    "t23_bpe_tokenize",
    "d29_bloom_decontamination",
    "t24_temperature_mixture",
    "st20_stream_quota_sampling",
)

# Fresh driver rows recorded in r04/r05/r06 — a round-7 prefix slot
# spent on one of these would be waste (the round's directive is
# staleness rotation, and none of their semantics changed this round).
RECENTLY_CHECKED = R04_GREEN | R05_GREEN | R06_GREEN

# The r03-stale entries the 50-slot window cannot fit (one yielded per
# operator added to the never-checked head during round 7). Chosen to
# yield because no round-4+ refactor (seam, skew guard, state
# partitioning) touches their plans.
DEFERRED_TO_R8 = {
    "q27_math_functions",
    "q29_array_functions",
    "q34_pivot",
    "q40_correlated_scalar",
    "q54_priority_lateness",
    "m01_multimodal_decode",  # multimodal path, untouched by the refactors
    "m02_frame_sampling",
    "w03_session_window",  # native session_window plan, refactor-immune
    "w04_interval_join",  # plain batch interval join, refactor-immune
}


def window():
    return list(plans.all_specs())[:DRIVER_WINDOW_SIZE]


def test_priority_list_is_exhaustive_and_valid():
    specs = plans.all_specs()
    assert len(specs) == len(set(specs))
    assert plans.DRIVER_WINDOW == [
        n for n in plans.DRIVER_WINDOW if n in specs
    ]


def test_window_leads_with_never_checked_entries():
    w = window()
    for i, name in enumerate(NEVER_CHECKED):
        assert w[i] == name, (
            f"slot {i} must be {name} (never driver-checked; the r6 verdict "
            f"requires new operators to lead the round-7 window), got {w[i]}"
        )


def test_window_is_filled_with_the_stalest_entries():
    """Every non-new slot must re-check an entry whose latest driver
    row is r02/r03 — the staleness rotation the r6 verdict directed."""
    # s05/p02 recorded r03 rows-only rows; they're stale too but sit
    # outside the curated hash-green sets above.
    stale_pool = (
        R02_GREEN | R03_GREEN | {"s05_ivf_search", "p02_flagship_retrieval"}
    ) - RECENTLY_CHECKED
    w = window()
    for name in w:
        if name in NEVER_CHECKED:
            continue
        assert name in stale_pool, (
            f"{name} occupies a round-7 slot but its last driver row is "
            f"recent (r04/r05/r06) — the slot belongs to a staler entry"
        )
    # Every r02-stale entry must be IN the window (they are the oldest).
    r02_stale = R02_GREEN - R03_GREEN - RECENTLY_CHECKED
    missing_r02 = r02_stale - set(w)
    assert not missing_r02, (
        f"r02-stale entries displaced from the window: {sorted(missing_r02)}"
    )
    # The window overflows by exactly the deferred refactor-immune
    # entries.
    missing = stale_pool - set(w)
    assert missing == DEFERRED_TO_R8, (
        f"wrong entries deferred to round 8: {sorted(missing)}"
    )


def test_priority_prefix_wastes_no_slot_on_recently_checked_queries():
    prefix = set(plans.DRIVER_WINDOW)
    wasted = prefix & RECENTLY_CHECKED
    assert not wasted, f"recently-checked queries in the prefix: {sorted(wasted)}"


def test_every_query_reaches_a_driver_window_by_round7():
    """Rounds 2-7 window contents must jointly cover the whole catalog."""
    covered = ALL_GREEN | set(NEVER_CHECKED) | set(window())
    covered |= {"s05_ivf_search", "p02_flagship_retrieval"}
    missing = [n for n in plans.all_specs() if n not in covered]
    assert not missing, f"queries never rotated into a driver window: {missing}"


def test_window_outputs_survive_pandas_canonicalization(spark):
    """No window entry may output array/map/struct columns — the
    driver canonicalizes EVERY collected result (rows-only included)
    with a pandas lexsort, which crashes on list cells (r02 q29, r03
    p01). Schema-only check — builds plans, executes nothing except
    the streaming entries' bounded micro-batch runs (skipped here;
    the oracle gate and test_streaming_semantics cover them)."""
    from conftest import SF_SMOKE

    specs = plans.all_specs()
    for name in window():
        if name.startswith("st"):
            continue  # streaming builders execute micro-batches at build
        df = specs[name].build(spark, SF_SMOKE)
        complex_cols = [
            f.name
            for f in df.schema.fields
            if f.dataType.simpleString().startswith(("array", "map", "struct"))
        ]
        assert not complex_cols, f"{name} outputs complex columns {complex_cols}"
