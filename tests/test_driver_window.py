"""The external driver records correctness rows for the FIRST 50
catalog entries only (observed: CORRECTNESS_r02..r08 each held exactly
the first 50 of the priority order). These tests pin the round-9
rotation (the r8 verdict's directive, executing the plan written in
round 8): the thirty-three r04-stale rows deferred from round 8 LEAD —
after this round nothing in the cross-round union is older than r05 —
then the operators new this round (never driver-checked), then
five of the fifty r05-stale rows; the remaining forty-five r05
rows (DEFERRED_TO_R10) lead the round-10 window."""

from __future__ import annotations

from real_time_genai_embeddings_for_rag_with_apache_flink_spark import plans

DRIVER_WINDOW_SIZE = 50

# The 33 entries whose latest driver row is r04 — deferred from the
# round-8 window, now the round-9 lead, in window order.
LEAD_R04 = (
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
)

# Never driver-checked (new in round 9); follow the r04 lead.
NEVER_CHECKED = (
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
)

# Latest driver row r05 (50 entries, from the artifacts). Five fit
# this window; the other forty-five are the round-10 lead.
LATEST_R05 = {
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

R05_IN_WINDOW = (
    "d04_minhash_lsh_pairs",
    "d05_simhash",
    "d06_simhash_hamming_pairs",
    "d08_dup_components",
    "d10_lsh_verified_dupes",
)

DEFERRED_TO_R10 = LATEST_R05 - set(R05_IN_WINDOW)


def window():
    return list(plans.all_specs())[:DRIVER_WINDOW_SIZE]


def test_priority_list_is_exhaustive_and_valid():
    specs = plans.all_specs()
    assert len(specs) == len(set(specs))
    assert plans.DRIVER_WINDOW == [
        n for n in plans.DRIVER_WINDOW if n in specs
    ]
    assert len(plans.DRIVER_WINDOW) == DRIVER_WINDOW_SIZE


def test_window_order_is_the_round9_rotation():
    w = window()
    expected = list(LEAD_R04) + list(NEVER_CHECKED) + list(R05_IN_WINDOW)
    assert w == expected, (
        "round-9 window must be: 33 r04-stale rows, then the new "
        "entries, then 5 r05-stale rows"
    )


def test_nothing_older_than_r05_after_this_round():
    """The r8 verdict's done-criterion: every r04-stale row gets a
    round-9 driver slot, so the cross-round union's stalest row after
    this round is r05."""
    missing = set(LEAD_R04) - set(window())
    assert not missing, f"r04-stale entries displaced: {sorted(missing)}"


def test_non_lead_slots_hold_r05_rows_only():
    """No slot may be wasted on an entry checked r06 or later."""
    w = window()
    for name in w:
        if name in LEAD_R04 or name in NEVER_CHECKED:
            continue
        assert name in LATEST_R05, (
            f"{name} occupies a round-9 slot but its last driver row is "
            f"r06+ — the slot belongs to a staler entry"
        )
    assert DEFERRED_TO_R10 == LATEST_R05 - set(w)
    assert len(DEFERRED_TO_R10) == 45


def test_stale_sets_match_the_recorded_artifacts():
    """The hand-pinned staleness sets above must agree with the actual
    CORRECTNESS_r02..r08 artifacts (latest round each name appears in)
    — catching copy-paste slips in the bookkeeping sets."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r0*.json"))):
        rnd = int(os.path.basename(f).split("_r")[1].split(".")[0])
        if rnd > 8:
            continue  # this file pins the ROUND-9 rotation inputs
        for name in json.load(open(f)):
            latest[name] = max(latest.get(name, 0), rnd)
    assert {n for n, r in latest.items() if r == 4} == set(LEAD_R04)
    assert {n for n, r in latest.items() if r == 5} == LATEST_R05
    assert not {n for n, r in latest.items() if r <= 3}
    for name in NEVER_CHECKED:
        assert name not in latest, f"{name} is not new — it has a driver row"


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
