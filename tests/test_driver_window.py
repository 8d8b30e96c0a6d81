"""The external driver records correctness rows for the FIRST 50
catalog entries only (observed: CORRECTNESS_r02..r10 each held exactly
the first 50 of the priority order). These tests pin the round-11
rotation (the r10 verdict's directive, executing the plan written in
round 10): the cross-round union's stalest cohort was the 50 rows last
checked in r06 — exactly one window — so the nine entries NEW this
round (never driver-checked) plus the re-oracled m03 displace the
ten cheapest-to-defer r06 rows (q45/q46/q47/q48 and
q32/q33/q71/q28/q73/q70 — pure scalar-function/relational entries
with six-round green histories whose operator families stay covered
by sibling window rows, e.g. q67 variant JSON stays for q28, q24/q65
strings for q70), which carry to round 12.

ROUND-12 PLAN (written in round 11, the established handoff): once
CORRECTNESS_r11 lands, the union's stalest rows are the ten deferred
q45 q46 q47 q48 q32 q33 q71 q28 q73 q70 (r06), then the 40 r07 rows.
The round-12 window is those ten + the r07 cohort, with any round-12
additions displacing the cheapest-to-defer r07 rows."""

from __future__ import annotations

from real_time_genai_embeddings_for_rag_with_apache_flink_spark import plans

DRIVER_WINDOW_SIZE = 50

# Deferred to round 12 (the four cheapest-to-defer r06 rows).
DEFERRED_TO_R12 = (
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

# The 40 remaining entries whose latest driver row is r06 — the
# round-11 lead.
LEAD_R06 = (
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
)

# Never driver-checked (new in round 11); follow the r06 lead.
NEVER_CHECKED = (
    "s05b_ivf_seeded",
    "p02b_flagship_retrieval_exact",
    "st29_stream_transform_with_state",
    "d32b_pagerank_fixed_point",
    "p03b_embed_distinct_exact",
    "p09b_rag_query_exact",
    "st30_kinesis_protocol_ingest",
    "st31_opensearch_protocol_sink",
    "t27_bpe_training_exact",
)

# Checked r09 but only rows-only; the oracle was upgraded to hash-exact
# in round 11 (r10 verdict #4 — the BMP real-decode un-gating), so the
# row must be re-recorded.
REVALIDATED = ("m03_media_features",)


def window():
    return list(plans.all_specs())[:DRIVER_WINDOW_SIZE]


def test_priority_list_is_exhaustive_and_valid():
    specs = plans.all_specs()
    assert len(specs) == len(set(specs))
    assert plans.DRIVER_WINDOW == [
        n for n in plans.DRIVER_WINDOW if n in specs
    ]
    assert len(plans.DRIVER_WINDOW) == DRIVER_WINDOW_SIZE


def test_window_order_is_the_round11_rotation():
    w = window()
    expected = list(LEAD_R06) + list(NEVER_CHECKED) + list(REVALIDATED)
    assert w == expected, (
        "round-11 window must be: 40 r06-stale rows, then the new "
        "entries, then the re-oracled m03"
    )


def test_only_the_declared_deferrals_miss_their_slot():
    """Every r06-stale row is either in this window or in the declared
    round-12 carry list — no silent displacement."""
    missing = (set(LEAD_R06) | set(DEFERRED_TO_R12)) - set(window())
    assert missing == set(DEFERRED_TO_R12), sorted(missing)


def test_stale_sets_match_the_recorded_artifacts():
    """The hand-pinned staleness sets above must agree with the actual
    CORRECTNESS_r02..r10 artifacts (latest round each name appears in)
    — catching copy-paste slips in the bookkeeping sets."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(f).split("_r")[1].split(".")[0])
        if rnd > 10:
            continue  # this file pins the ROUND-11 rotation inputs
        for name in json.load(open(f)):
            latest[name] = max(latest.get(name, 0), rnd)
    assert {n for n, r in latest.items() if r == 6} == (
        set(LEAD_R06) | set(DEFERRED_TO_R12)
    )
    assert not {n for n, r in latest.items() if r <= 5}
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
