"""The external driver records correctness rows for the FIRST 50
catalog entries only (observed: CORRECTNESS_r02..r11 each held exactly
the first 50 of the priority order). These tests pin the round-12
rotation (executing the plan written in round 11): after
CORRECTNESS_r11 the cross-round union's stalest rows were the ten
deferred from the r11 window (last checked r06), then the 50-row r07
cohort. The ten lead this window; the r07 cohort follows; the six
entries NEW this round (never driver-checked: s09b, t23b, m03b, s22b,
st32, st33) displace the 16 cheapest-to-defer r07 rows — the 11 pure-relational
TPC-H-family entries q49-q60 (seven-round green histories; their
join/aggregate families stay covered in-window by q32/q33/q71 and the
d/s/st/t rows) plus t24_temperature_mixture (mixture siblings: t08
stays in-window, t21 checked r11), w01_tumbling_window (sibling w02
stays; streaming tumbling twin st01 checked r11), d07_hash_sample
(sampling siblings d09 and st20 stay in-window), and
s07_scalar_quantization (quantization siblings s09b new-in-window and
s20b r11-checked cover the family), and t05_rolling_hash (content-hash
siblings d01/d03 stay in-window; d17/t19 checked r11) — which carry to
round 13.

ROUND-13 PLAN (written in round 12, the established handoff): once
CORRECTNESS_r12 lands, the union's stalest rows are the 16 deferred
r07 rows q49 q50 q51 q52 q53 q55 q56 q57 q58 q59 q60 t24 w01 d07 s07
t05, then the 50-row r08 cohort. The round-13 window is those 16 + the
r08 cohort, with any round-13 additions displacing the
cheapest-to-defer r08 rows."""

from __future__ import annotations

from real_time_genai_embeddings_for_rag_with_apache_flink_spark import plans

DRIVER_WINDOW_SIZE = 50

# Deferred to round 13 (the 16 cheapest-to-defer r07 rows).
DEFERRED_TO_R13 = (
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

# The ten rows whose latest driver record is r06 — deferred from the
# r11 window, leading this one.
LEAD_R06 = (
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
)

# The 34 r07-cohort rows that keep their slot.
LEAD_R07 = (
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
)

# Never driver-checked (new in round 12); take the final slots.
NEVER_CHECKED = (
    "s09b_pq_seeded",
    "t23b_bpe_tokenize_exact",
    "m03b_png_features",
    "s22b_projection_ann_seeded",
    "st32_kinesis_producer_roundtrip",
    "st33_reference_topology_wire_to_wire",
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


def test_window_order_is_the_round12_rotation():
    w = window()
    expected = list(LEAD_R06) + list(LEAD_R07) + list(NEVER_CHECKED)
    assert w == expected, (
        "round-12 window must be: the ten r06-stale deferrals, the r07 "
        "cohort minus the declared round-13 deferrals, then the new "
        "entries"
    )


def test_only_the_declared_deferrals_miss_their_slot():
    """Every r06/r07-stale row is either in this window or in the
    declared round-13 carry list — no silent displacement."""
    missing = (
        set(LEAD_R06) | set(LEAD_R07) | set(DEFERRED_TO_R13)
    ) - set(window())
    assert missing == set(DEFERRED_TO_R13), sorted(missing)


def test_stale_sets_match_the_recorded_artifacts():
    """The hand-pinned staleness sets above must agree with the actual
    CORRECTNESS_r02..r11 artifacts (latest round each name appears in)
    — catching copy-paste slips in the bookkeeping sets."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(f).split("_r")[1].split(".")[0])
        if rnd > 11:
            continue  # this file pins the ROUND-12 rotation inputs
        for name in json.load(open(f)):
            latest[name] = max(latest.get(name, 0), rnd)
    assert {n for n, r in latest.items() if r == 6} == set(LEAD_R06)
    assert {n for n, r in latest.items() if r == 7} == (
        set(LEAD_R07) | set(DEFERRED_TO_R13)
    )
    assert not {n for n, r in latest.items() if r <= 5}
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
