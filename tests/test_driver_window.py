"""The external driver records correctness rows for the FIRST 50
catalog entries only (observed: CORRECTNESS_r02..r12 each held exactly
the first 50 of the priority order). These tests pin the round-13
rotation (executing the plan written in round 12): after
CORRECTNESS_r12 the cross-round union's stalest rows were the 16
deferred from the r12 window (last checked r07: q49-q60, t24, w01,
d07, s07, t05), then the 50-row r08 cohort. The 16 lead this window;
the r08 cohort follows; the six entries NEW this round (never
driver-checked: st34 the fault-injected wire topology, s06b the
seeded k-means assignment twin, m07 GIF/LZW real-decode features,
st35 the idempotent-sink torn-bulk certification, st36 the
exactly-once checkpoint-restart wire certification, s29 the
Matryoshka prefix-dimension ANN serving path) displace — together
with the 16 leads — the 22 cheapest-to-defer r08 rows, which carry to
round 14. Per-row deferral reasoning is inline in
DEFERRED_TO_R14 below.

ROUND-14 PLAN (written in round 13, the established handoff): once
CORRECTNESS_r13 lands, the union's stalest rows are the 22 deferred
r08 rows in DEFERRED_TO_R14, then the 48-row r09 cohort. The round-14
window is those 22 + 28 of the r09 cohort, with any round-14 additions
displacing the cheapest-to-defer r09 rows (20 r09 rows defer to r15
even with zero additions)."""

from __future__ import annotations

from real_time_genai_embeddings_for_rag_with_apache_flink_spark import plans

DRIVER_WINDOW_SIZE = 50

# Deferred to round 14 (the 22 cheapest-to-defer r08 rows). Every
# deferral leaves its family covered by an in-window or r11/r12-checked
# sibling:
# - s06_kmeans_cells (rows-only; its assignment path is hash-exact
#   in-window via the new s06b twin), d14_semantic_dedup (rows-only;
#   seeded twin d34 checked r12-era, cell machinery via s06b),
# - s09/s10/s20/s21/s22 (PQ/IVF-PQ/PCA families: seeded hash-exact
#   twins s09b + s22b checked r12, s20b r11; IVF itself via s05 r12),
# - t22b (BPE family: t22/t23/t23b all checked r12),
# - q27/q29/q34/q40/q54 (scalar/pivot/subquery/TPC-H families: q45-q48
#   q28 q70 q73 q32 q33 checked r12, q34b/q35 r09, q49-q60 in-window),
# - m01/m02 (decode/media families: m03b checked r12, m07 new
#   in-window, m04 r09),
# - w15/w16/w17 (window-fn families: w11/w22 r09, w12b r12 for
#   distinct-user sketches, SCD2 stays covered by in-window w18),
# - st08 (streaming session window: batch sibling w03 stays in-window,
#   st01/st02 streaming event-time stays in-window),
# - w19 (funnel/attribution family: w07 and w21 both checked r09;
#   displaced by the late-added st35),
# - st24 (table-maintenance family: p19 z-order and p20 compaction
#   planner stay in-window; displaced by the late-added st36),
# - s24 (coarse-pass advisor: its subject s23 stays in-window and the
#   advisor pattern's sibling d28 has its own union row; displaced by
#   the late-added s29).
DEFERRED_TO_R14 = (
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

# The 16 rows whose latest driver record is r07 — deferred from the
# r12 window, leading this one.
LEAD_R07 = (
    "q49_priority_late_orders",
    "q50_argmax_aggregates",
    "q51_volume_shipping",
    "q52_market_share",
    "q53_product_profit",
    "q55_promo_revenue",
    "q56_top_supplier",
    "q57_supplier_part_counts",
    "q58_disjunctive_join",
    "q59_excess_volume_suppliers",
    "q60_waiting_orders",
    "t24_temperature_mixture",
    "w01_tumbling_window",
    "d07_hash_sample",
    "s07_scalar_quantization",
    "t05_rolling_hash",
)

# The 28 r08-cohort rows that keep their slot.
LEAD_R08 = (
    "d30_leakage_safe_split",
    "d31_weighted_sample",
    "d32_dup_graph_pagerank",
    "p01_pipeline_sink_docs",
    "p03_embed_distinct",
    "p05_vecdir_sink_roundtrip",
    "p15_snapshot_diff",
    "p16_cdc_apply",
    "p17_data_quality_gate",
    "p18_incremental_view_maintenance",
    "p19_zorder_clustering",
    "p20_compaction_planner",
    "p21_k_anonymity_audit",
    "s23_binary_hamming_ann",
    "s25_retrieval_eval",
    "s26_maxsim_late_interaction",
    "st01_stream_tumbling_complete",
    "st02_stream_watermark_append",
    "st05_stream_embed_pipeline",
    "st07_stream_stream_join",
    "st12_python_stream_source",
    "st21_stream_zscore_anomaly",
    "st22_stream_cdc_apply",
    "st23_stream_ivm",
    "t25_source_divergence",
    "w03_session_window",
    "w04_interval_join",
    "w18_scd2_snapshot",
)

# Never driver-checked (new in round 13); take the final slots.
NEVER_CHECKED = (
    "st34_wire_topology_fault_injected",
    "s06b_kmeans_cells_seeded",
    "m07_gif_features",
    "st35_idempotent_sink_torn_bulk",
    "st36_restart_exactly_once_wire",
    "s29_matryoshka_prefix_ann",
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


def test_window_order_is_the_round13_rotation():
    w = window()
    expected = list(LEAD_R07) + list(LEAD_R08) + list(NEVER_CHECKED)
    assert w == expected, (
        "round-13 window must be: the 16 r07-stale deferrals, the r08 "
        "cohort minus the declared round-14 deferrals, then the new "
        "entries"
    )


def test_only_the_declared_deferrals_miss_their_slot():
    """Every r07/r08-stale row is either in this window or in the
    declared round-14 carry list — no silent displacement."""
    missing = (
        set(LEAD_R07) | set(LEAD_R08) | set(DEFERRED_TO_R14)
    ) - set(window())
    assert missing == set(DEFERRED_TO_R14), sorted(missing)


def test_stale_sets_match_the_recorded_artifacts():
    """The hand-pinned staleness sets above must agree with the actual
    CORRECTNESS_r02..r12 artifacts (latest round each name appears in)
    — catching copy-paste slips in the bookkeeping sets."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(f).split("_r")[1].split(".")[0])
        if rnd > 12:
            continue  # this file pins the ROUND-13 rotation inputs
        for name in json.load(open(f)):
            latest[name] = max(latest.get(name, 0), rnd)
    assert {n for n, r in latest.items() if r == 7} == set(LEAD_R07)
    assert {n for n, r in latest.items() if r == 8} == (
        set(LEAD_R08) | set(DEFERRED_TO_R14)
    )
    assert not {n for n, r in latest.items() if r <= 6}
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
    for f in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
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
