"""The external driver records correctness rows for the FIRST 50
catalog entries only (observed: CORRECTNESS_r02..r07 each held exactly
the first 50 of the priority order). These tests pin the round-8
rotation (the r7 verdict's directive): the operators new this round
lead (never driver-checked), then the nine refactor-immune entries
deferred from round 7 (latest driver row r03), then the stalest r04
rows — except the thirty-three pivot/percentile/subquery/histogram/
TPC-H/media/salted/packing/cohort/window/curation plans the window cannot fit
(latest row r04, untouched by any refactor since), which lead the
round-9 window."""

from __future__ import annotations

from real_time_genai_embeddings_for_rag_with_apache_flink_spark import plans

DRIVER_WINDOW_SIZE = 50

# Latest driver row per entry, computed from CORRECTNESS_r02..r07
# (max round in which each name appears). Only the stale tail matters
# for the rotation; everything else was checked r05-r07.
LATEST_R03 = {
    "m01_multimodal_decode", "m02_frame_sampling", "q27_math_functions",
    "q29_array_functions", "q34_pivot", "q40_correlated_scalar",
    "q54_priority_lateness", "w03_session_window", "w04_interval_join",
}

LATEST_R04 = {
    "d11_repeated_ngrams", "d12_decontamination", "d13_training_shards",
    "d14_semantic_dedup", "m03_media_features", "m04_media_resize",
    "p01_pipeline_sink_docs", "p03_embed_distinct", "p04_python_datasource",
    "p05_vecdir_sink_roundtrip", "q34b_pivot_native", "q35_unpivot",
    "q36_percentiles", "q41_min_price_line", "q42_rich_inactive_customers",
    "q43_large_volume_orders", "q61_important_parts", "q62_returned_items",
    "q63_customer_distribution", "q64_histogram", "r01_salted_join",
    "r02_salted_aggregation", "s06_kmeans_cells", "s09_product_quantization",
    "s10_ivfpq_search", "s11_hybrid_rrf", "s12_random_projection",
    "st01_stream_tumbling_complete", "st02_stream_watermark_append",
    "st05_stream_embed_pipeline", "st07_stream_stream_join",
    "st08_stream_session_append", "st12_python_stream_source",
    "t09_curation_rules", "t10_repetition_stats", "t11_bm25_retrieval",
    "t12_vocab_heavy_hitters", "t13_sequence_packing", "t14_source_caps",
    "t15_bigram_lm_quality", "t16_source_datacard", "w05_windowed_topk_users",
    "w06_time_weighted_avg", "w07_event_funnel", "w08_subsequence_search",
    "w09_retention_cohorts",
}

# Never driver-checked (new in round 8); MUST lead the round-8 window.
NEVER_CHECKED = (
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
)

# The r04-stale entries the 50-slot window cannot fit. Chosen to yield
# because no round-5+ refactor (seam, skew guard, state partitioning,
# GEMM assignment, streaming state protocol) touches their plans.
DEFERRED_TO_R9 = {
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
}


def window():
    return list(plans.all_specs())[:DRIVER_WINDOW_SIZE]


def test_priority_list_is_exhaustive_and_valid():
    specs = plans.all_specs()
    assert len(specs) == len(set(specs))
    assert plans.DRIVER_WINDOW == [
        n for n in plans.DRIVER_WINDOW if n in specs
    ]
    assert len(plans.DRIVER_WINDOW) == DRIVER_WINDOW_SIZE


def test_window_leads_with_never_checked_entries():
    w = window()
    for i, name in enumerate(NEVER_CHECKED):
        assert w[i] == name, (
            f"slot {i} must be {name} (never driver-checked; the r7 verdict "
            f"requires new operators to lead the round-8 window), got {w[i]}"
        )


def test_window_is_filled_with_the_stalest_entries():
    """Every non-new slot must re-check an entry whose latest driver
    row is r03/r04 — the staleness rotation the r7 verdict directed."""
    stale_pool = LATEST_R03 | LATEST_R04
    w = window()
    for name in w:
        if name in NEVER_CHECKED:
            continue
        assert name in stale_pool, (
            f"{name} occupies a round-8 slot but its last driver row is "
            f"recent (r05/r06/r07) — the slot belongs to a staler entry"
        )
    # Every r03-stale entry must be IN the window (they are the oldest;
    # the r7 verdict names them the round-8 window lead).
    missing_r03 = LATEST_R03 - set(w)
    assert not missing_r03, (
        f"r03-stale entries displaced from the window: {sorted(missing_r03)}"
    )
    # The window overflows by exactly the deferred refactor-immune
    # entries.
    missing = stale_pool - set(w)
    assert missing == DEFERRED_TO_R9, (
        f"wrong entries deferred to round 9: {sorted(missing)}"
    )


def test_priority_prefix_wastes_no_slot_on_recently_checked_queries():
    recent = (
        set(plans.all_specs()) - LATEST_R03 - LATEST_R04 - set(NEVER_CHECKED)
    )
    wasted = set(plans.DRIVER_WINDOW) & recent
    assert not wasted, f"recently-checked queries in the prefix: {sorted(wasted)}"


def test_stale_sets_match_the_recorded_artifacts():
    """The hand-pinned staleness sets above must agree with the actual
    CORRECTNESS_r02..r07 artifacts (latest round each name appears in)
    — catching copy-paste slips in the bookkeeping sets."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r0*.json"))):
        rnd = int(os.path.basename(f).split("_r")[1].split(".")[0])
        if rnd > 7:
            continue  # this file pins the ROUND-8 rotation inputs
        for name in json.load(open(f)):
            latest[name] = max(latest.get(name, 0), rnd)
    assert {n for n, r in latest.items() if r == 3} == LATEST_R03
    assert {n for n, r in latest.items() if r == 4} == LATEST_R04
    assert len(LATEST_R04) == 46


def test_every_query_has_a_driver_row_or_a_window_slot():
    """The real coverage invariant: every catalog entry either already
    has a driver row (appears in SOME CORRECTNESS artifact) or sits in
    the current window to get one this round. A new @query added
    without a window slot fails here instead of silently never being
    driver-checked."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    checked: set[str] = set()
    for f in glob.glob(os.path.join(root, "CORRECTNESS_r0*.json")):
        checked |= set(json.load(open(f)))
    w = set(window())
    uncovered = [
        n for n in plans.all_specs() if n not in checked and n not in w
    ]
    assert not uncovered, (
        f"queries with no driver row and no window slot: {uncovered}"
    )
    for name in NEVER_CHECKED:
        assert name in w, f"new entry {name} missing from the window"


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
