"""The external driver records correctness rows for the FIRST 50
catalog entries only (observed: CORRECTNESS_r02..r13 each held exactly
the first 50 of the priority order). These tests pin the round-14
rotation (executing the plan written in round 13): after
CORRECTNESS_r13 the cross-round union's stalest rows were the 22 r08
rows deferred from the r13 window, then the 48-row r09 cohort. The 22
lead this window; 23 of the r09 cohort follow; the five entries NEW
this round (never driver-checked: s30 the graph-beam ANN serving twin,
st37 the exactly-once live-reshard wire certification, st38 the
streaming binary-Hamming index maintenance, st39 the streaming
graph-index maintenance, d35 exact duplicated-span detection) take
the final slots, displacing the 25 cheapest-to-defer r09 rows, which
carry to round 15.
Per-row deferral reasoning is inline in DEFERRED_TO_R15 below.

ROUND-15 PLAN (written in round 14, the established handoff): once
CORRECTNESS_r14 lands, the union's stalest rows are the 25 deferred
r09 rows in DEFERRED_TO_R15, then the 50-row r10 cohort. The round-15
window is those 25 + 25 of the r10 cohort, with any round-15 additions
displacing the cheapest-to-defer r10 rows (25 r10 rows defer to r16
even with zero additions)."""

from __future__ import annotations

from real_time_genai_embeddings_for_rag_with_apache_flink_spark import plans

DRIVER_WINDOW_SIZE = 50

# Deferred to round 15 (the 25 cheapest-to-defer r09 rows). Every
# deferral leaves its family covered by an in-window or r12/r13-checked
# sibling:
# - d05/d06 (SimHash/hamming-pairs: d04 LSH pairing stays in-window,
#   the popcount machinery is r13-checked via s23 and in-window via
#   st38/s30),
# - d11_repeated_ngrams (t10 repetition stats stays in-window),
# - d13_training_shards (t13 sequence packing in-window; d30
#   leakage-safe split checked r13),
# - q34b_pivot_native (its subject q34 leads this window),
# - q42/q43 (subquery family: q40 correlated-scalar in-window, q32/q33
#   checked r12; q41 keeps the scalar-subquery slot),
# - q61/q62/q63 (TPC-H multi-join shapes: q49-q60 all checked r13),
# - m04_media_resize (m01 decode + m02 frame sampling lead in-window),
# - r02_salted_aggregation (skew family: r01 salted_join keeps the
#   slot — same machinery, join + agg variants; displaced by the
#   late-added d35),
# - s12_random_projection (s22 PCA-ANN in-window; the hyperplane
#   projection machinery is in-window via s30 and r13-checked via s29),
# - s27_ann_quality_certification (its ground-truth subject s25 was
#   checked r13; s24's advisor pattern is in-window),
# - st25_stream_maxsim_serving (batch maxsim s26 checked r13; st38
#   keeps a streaming-ANN-serving row in-window),
# - st27_stream_quality_gate (p17 checked r13; st21-23 stateful
#   streaming checked r13),
# - st28_stream_dup_components (batch components d08 stays in-window;
#   streaming dedup maintenance st14 checked r13),
# - t14_source_caps (d31 weighted-sample caps checked r13; t25 source
#   divergence checked r13),
# - t16_source_datacard (t25 checked r13; p22 statistics in-window),
# - w05_windowed_topk_users (windowed top-k family: the sliding-frame
#   machinery stays in-window via w16, the per-group WindowGroupLimit
#   cut via s23/s30; displaced by the late-added st39),
# - w06_time_weighted_avg (rolling-window family: w15 leads in-window,
#   w22 cusum stays in-window),
# - w08_subsequence_search (w07 funnel stays in-window),
# - w20_event_transition_matrix (its streaming twin st26 keeps the
#   transition-matrix slot in-window),
# - w21_time_to_conversion (w19 purchase attribution leads in-window),
# - w23_state_dwell_time (transition family covered by in-window st26;
#   SCD2 duration shapes by w17/w18).
DEFERRED_TO_R15 = (
    "d05_simhash",
    "d06_simhash_hamming_pairs",
    "d11_repeated_ngrams",
    "d13_training_shards",
    "m04_media_resize",
    "q34b_pivot_native",
    "q42_rich_inactive_customers",
    "q43_large_volume_orders",
    "q61_important_parts",
    "q62_returned_items",
    "r02_salted_aggregation",
    "q63_customer_distribution",
    "s12_random_projection",
    "s27_ann_quality_certification",
    "st25_stream_maxsim_serving",
    "st27_stream_quality_gate",
    "st28_stream_dup_components",
    "t14_source_caps",
    "t16_source_datacard",
    "w05_windowed_topk_users",
    "w06_time_weighted_avg",
    "w08_subsequence_search",
    "w20_event_transition_matrix",
    "w21_time_to_conversion",
    "w23_state_dwell_time",
)

# The 22 rows whose latest driver record is r08 — deferred from the
# r13 window, leading this one.
LEAD_R08 = (
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
)

# The 23 r09-cohort rows that keep their slot.
LEAD_R09 = (
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
)

# Never driver-checked (new in round 14); take the final slots.
NEVER_CHECKED = (
    "s30_graph_beam_ann",
    "st37_reshard_exactly_once_wire",
    "st38_stream_hamming_index_maintenance",
    "st39_stream_graph_index_maintenance",
    "d35_exact_dup_spans",
)


def window():
    return list(plans.all_specs())[:DRIVER_WINDOW_SIZE]


def test_priority_list_is_exhaustive_and_valid():
    specs = plans.all_specs()
    assert len(specs) == len(set(specs))
    assert plans.DRIVER_WINDOW == [
        n for n in plans.DRIVER_WINDOW if n in specs
    ]
    assert len(plans.DRIVER_WINDOW) == DRIVER_WINDOW_SIZE


def test_window_order_is_the_round14_rotation():
    w = window()
    expected = list(LEAD_R08) + list(LEAD_R09) + list(NEVER_CHECKED)
    assert w == expected, (
        "round-14 window must be: the 22 r08-stale deferrals, the r09 "
        "cohort minus the declared round-15 deferrals, then the new "
        "entries"
    )


def test_only_the_declared_deferrals_miss_their_slot():
    """Every r08/r09-stale row is either in this window or in the
    declared round-15 carry list — no silent displacement."""
    missing = (
        set(LEAD_R08) | set(LEAD_R09) | set(DEFERRED_TO_R15)
    ) - set(window())
    assert missing == set(DEFERRED_TO_R15), sorted(missing)


def test_stale_sets_match_the_recorded_artifacts():
    """The hand-pinned staleness sets above must agree with the actual
    CORRECTNESS_r02..r13 artifacts (latest round each name appears in)
    — catching copy-paste slips in the bookkeeping sets."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(f).split("_r")[1].split(".")[0])
        if rnd > 13:
            continue  # this file pins the ROUND-14 rotation inputs
        for name in json.load(open(f)):
            latest[name] = max(latest.get(name, 0), rnd)
    assert {n for n, r in latest.items() if r == 8} == set(LEAD_R08)
    assert {n for n, r in latest.items() if r == 9} == (
        set(LEAD_R09) | set(DEFERRED_TO_R15)
    )
    assert not {n for n, r in latest.items() if r <= 7}
    for name in NEVER_CHECKED:
        assert name not in latest, f"{name} is not new — it has a driver row"
