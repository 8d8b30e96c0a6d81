"""The external driver records correctness rows for the FIRST 50
catalog entries only (observed: CORRECTNESS_r02..r09 each held exactly
the first 50 of the priority order). These tests pin the round-10
rotation (the r9 verdict's directive, executing the plan written in
round 9): the forty-five r05-stale rows deferred from round 9 LEAD —
after this round nothing in the cross-round union is older than r06 —
then the operators new this round (never driver-checked), then m06,
whose oracle was upgraded rows-only -> hash-exact this round and whose
certification therefore needs re-recording.

ROUND-11 PLAN (written in round 10, the established handoff): once
CORRECTNESS_r10 lands, the cross-round union's stalest cohort is the 50
rows last checked in r06 — exactly one window: d20 d21 d22 d23 d24 d25
d26 d27 d28 m05 p09 p10 p11 p12 p13 p14 q28 q32 q33 q44 q45 q46 q47
q48 q67 q68 q69 q70 q71 q72 q73 s15 s17 s18 s19 st14 st15 st16 st17
st18 st19 t19 t20 t21 u04 w10 w11 w12 w13 w14. Any entry NEW in round
11 must displace one of these (pick the cheapest-to-defer r06 row and
carry it to round 12), or round 11 adds no entries and runs the clean
50."""

from __future__ import annotations

from real_time_genai_embeddings_for_rag_with_apache_flink_spark import plans

DRIVER_WINDOW_SIZE = 50

# The 45 entries whose latest driver row is r05 — deferred from the
# round-9 window (its DEFERRED_TO_R10 set), now the round-10 lead.
LEAD_R05 = (
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
)

# Never driver-checked (new in round 10); follow the r05 lead.
NEVER_CHECKED = (
    "s20b_ivfadc_seeded",
    "d34_semantic_dedup_seeded",
    "t26_curriculum_order",
    "s28_hard_negative_mining",
)

# Checked r09 but only rows-only; the oracle was upgraded to hash-exact
# in round 10 (r9 verdict #5), so the row must be re-recorded.
REVALIDATED = ("m06_crossmodal_retrieval",)


def window():
    return list(plans.all_specs())[:DRIVER_WINDOW_SIZE]


def test_priority_list_is_exhaustive_and_valid():
    specs = plans.all_specs()
    assert len(specs) == len(set(specs))
    assert plans.DRIVER_WINDOW == [
        n for n in plans.DRIVER_WINDOW if n in specs
    ]
    assert len(plans.DRIVER_WINDOW) == DRIVER_WINDOW_SIZE


def test_window_order_is_the_round10_rotation():
    w = window()
    expected = list(LEAD_R05) + list(NEVER_CHECKED) + list(REVALIDATED)
    assert w == expected, (
        "round-10 window must be: 45 r05-stale rows, then the new "
        "entries, then the re-oracled m06"
    )


def test_nothing_older_than_r06_after_this_round():
    """The r9 verdict's done-criterion: every r05-stale row gets a
    round-10 driver slot, so the cross-round union's stalest row after
    this round is r06."""
    missing = set(LEAD_R05) - set(window())
    assert not missing, f"r05-stale entries displaced: {sorted(missing)}"


def test_stale_sets_match_the_recorded_artifacts():
    """The hand-pinned staleness sets above must agree with the actual
    CORRECTNESS_r02..r09 artifacts (latest round each name appears in)
    — catching copy-paste slips in the bookkeeping sets."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(f).split("_r")[1].split(".")[0])
        if rnd > 9:
            continue  # this file pins the ROUND-10 rotation inputs
        for name in json.load(open(f)):
            latest[name] = max(latest.get(name, 0), rnd)
    assert {n for n, r in latest.items() if r == 5} == set(LEAD_R05)
    assert not {n for n, r in latest.items() if r <= 4}
    for name in NEVER_CHECKED:
        assert name not in latest, f"{name} is not new — it has a driver row"
    for name in REVALIDATED:
        assert latest.get(name) == 9, f"{name} should carry an r09 row"


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
