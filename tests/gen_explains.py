"""Regenerate EXPLAINS.md: the executed physical plan for each headline
query at sf0.001, with the scale-relevant shapes called out. Run:

    python tests/gen_explains.py

The file is a reviewing aid — the authoritative plan-shape contracts are
the assertions in tests/test_plan_shapes.py and
tests/test_partition_pruning.py; this just makes the plans readable
without running Spark."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"

# (query, what to look for in the plan)
HEADLINES = [
    ("q01_pricing_summary", "partial HashAggregate below one Exchange, final above — 6M rows/SF collapse to 6 groups before the shuffle"),
    ("q03_shipping_priority", "BroadcastHashJoin for the filtered dimension sides; TakeOrderedAndProject instead of a global sort"),
    ("q05_local_supplier_volume", "all five dimension joins broadcast; only the fact chain shuffles"),
    ("q06_forecast_revenue", "every predicate in PushedFilters; ReadSchema pruned to the 3 referenced columns"),
    ("d04_minhash_lsh_pairs", "one Exchange on (band_idx, band_key) shared by the bucket-stats window and the self-join; cap-and-star-link guard branches"),
    ("d21_scalable_components", "per-alternation shape: two HashAggregates + one join on the edge list, lineage cut by localCheckpoint (shown as ExistingRDD scan)"),
    ("s01_topk_cosine", "single narrow scan + dot-product fold, TakeOrderedAndProject top-10 — no shuffle beyond the k-row merge"),
    ("s15_knn_graph", "WindowGroupLimit below the rank window: each partition cuts to top-3 per node before anything ships"),
    ("t19_segment_dedup_clean", "cross-document agreement shuffle carries md5 hashes; text appears only in the final per-doc regroup"),
    ("p10_training_manifest", "composition over cached seam intermediates (InMemoryTableScan); per-shard window rank, no range-partitioned global sort"),
    ("p11_partitioned_layout", "lang predicate satisfied in PartitionFilters (directory pruning), not a row filter"),
    ("p13_bucketed_join", "both scans Bucketed: true; SortMergeJoin and the per-order aggregate with ZERO Exchange below them — the only shuffle is the 5-row final rollup"),
    ("d27_prefix_filter_join", "equi-joins only (prefix-token candidates, id-keyed verify) — no CartesianProduct/BNLJ fallback; the all-pairs comparison exists solely in the DuckDB oracle"),
    ("w13b_peak_concurrency_twophase", "phase-1 Window partitioned by (event_type, bucket) — a hot key's sweep spreads over buckets; phase-2 carry-in Window runs over keys x n_buckets ROWS, then one aggregate"),
    ("w12b_sketch_wau", "hll_sketch_agg partial-merges map-side; the explode fans out day-level SKETCH rows (calendar-sized), never user rows, before hll_union_agg"),
    ("d29_bloom_decontamination", "the bloom probe is a Project/Filter over the distinct-gram scan — getbit over a literal word array, NO join on the membership test; joins appear only for per-doc counts"),
    ("w15_rolling_zscore_anomaly", "one Exchange on event_type; bounded RowFrame(-20,-1) window (21-row state regardless of stream length); ReadSchema pruned to 4 columns — props/user_id never read"),
    ("w16_windowed_distinct_users", "collect_set inside a bounded 50-row frame (the COUNT(DISTINCT) OVER Spark lacks), then a combinable per-type summary aggregate"),
    ("w17_scd2_dimension_join", "SCD2: one LEAD window builds validity intervals; the point-in-time join is an EQUI hash join on user_id with the interval as a residual predicate — no nested loop"),
    ("p15_snapshot_diff", "two 16-byte fingerprint projections of the same scan full-outer-joined on doc_id — one shuffle, text never ships; 4-group combinable rollup"),
    ("p16_cdc_apply", "CDC compaction is partial_max(struct) map-side on BOTH halves (no row_number window anywhere); delta-over-base merge is one full-outer SortMergeJoin on the key"),
    ("d30_leakage_safe_split", "components come from the edge list alone; the corpus join back is one shuffle and the 80/10/10 split bucket is codegen'd md5/conv arithmetic — no window, no Python"),
    ("s21_pca_projection", "fit reduced to one mapInPandas partial-moments pass (bounded driver read); the projection GEMM is a single ArrowEvalPython over a (vec_id, embedding)-pruned scan"),
    ("d31_weighted_sample", "exp-sort key is pure codegen'd arithmetic on the scan; the weighted top-n is TakeOrderedAndProject — per-partition top-n, driver merge, no global sort"),
    ("w18_scd2_snapshot", "time travel as a pure row filter over the LEAD-built validity intervals — one window, one filter, at most one version per entity"),
    ("s22_pca_ann", "coarse pass joins only (vec_id, proj) against the broadcast projected queries; the 40-id shortlist rejoins raw vectors as a broadcast hash join for the exact re-rank"),
    ("p17_data_quality_gate", "11 rule evaluations: conditional aggregates sharing one scan per table, PK uniqueness from one groupBy, FK rules as key-only left joins — unioned into one report"),
    ("s23_binary_hamming_ann", "coarse pass carries only (vec_id, b0, b1) — popcount Hamming in WholeStageCodegen against the broadcast 10-row query side; WindowGroupLimit under both rank cuts; the shortlist rejoins raw vectors as broadcast hash joins"),
    ("p18_incremental_view_maintenance", "both compactions are partial_max(struct) map-side; the only base-state touch is one key equi-join on delta keys; retract/insert unions telescope in ONE group-count-sized final aggregate"),
    ("p19_zorder_clustering", "the Morton key is a flat 24-term shift/mask Project inside WholeStageCodegen over a 2-column pruned scan; one Exchange for the 64-bucket envelope aggregate, no sort anywhere"),
    ("s25_retrieval_eval", "broadcast query side; two-phase WindowGroupLimit under the rank cut so the shuffle carries <= |Q|*k rows; hits/DCG fold as integer aggregates over the ranked rows"),
    ("s26_maxsim_late_interaction", "BroadcastNestedLoopJoin against the driver-sized query-token set; the (query, doc, token) MAX shows partial_max below the Exchange — post-combine rows independent of per-doc vector counts; integer SUM then per-query WindowGroupLimit"),
    ("t25_source_divergence", "corpus collapses to (source, token, count) with partial_count below the Exchange; the pair join is token-keyed over the vocabulary; per-source totals and the pair frame are broadcast"),
    ("p20_compaction_planner", "one hash Exchange on source for the running-sum window; both branches of the union read the same 3-column pruned scan; all-integer output, no sort"),
    ("s27_ann_quality_certification", "the s23 Hamming shortlist + exact re-rank at s25's query split, then the shared eval_ranked metric fold: both rank cuts two-phase WindowGroupLimit, every join broadcast, metrics integer aggregates — the whole approximate pipeline + its grading in codegen"),
    ("m06_crossmodal_retrieval", "payload embeddings come out of one Arrow mapInPandas (bytes never cross an Exchange); broadcast text-query side; per-query top-5 via WindowGroupLimit"),
    ("w20_event_transition_matrix", "one user_id Exchange for the lag window; pair counts show partial_count below their Exchange (post-combine cardinality = |types|^2); the probability window runs over that tiny aggregate"),
    ("w21_time_to_conversion", "both funnel firsts are conditional partial_min in ONE aggregate over a 3-column pruned scan — no self-join, no window over events; the day rollup is group-cardinality-sized"),
    ("d33_cross_source_dup_matrix", "corpus collapses to DISTINCT (source, fp) map-side; the pair join shuffles 16-byte fingerprints, never text; per-source totals rejoin broadcast"),
    ("w22_cusum_drift", "the CUSUM reflection identity as two STACKED windows (running sum, then running min) sharing one event_type exchange; the count-scaled walk is DECIMAL(38,0) exact integers; per-type stats join back broadcast"),
    ("p22_column_statistics", "every exact NDV rides ONE Expand over one scan, partial-aggregated map-side; nulls/ranges/averages share the same pass — ANALYZE as a single declarative aggregate"),
    ("w23_state_dwell_time", "one LEAD window on user_id (truncate-to-second before differencing), then a combinable per-type rollup — no join, no second pass"),
    ("s20b_ivfadc_seeded", "assign + residual PQ encode are narrow literal-fold projections (no exchange); the ADC scan joins broadcast probes and cuts via two-phase WindowGroupLimit on exact-integer partial sums; the refinement re-joins raw vectors by broadcast id join — the corpus never shuffles"),
    ("t26_curriculum_order", "NO Exchange SinglePartition anywhere: both exact global ranks are quantile-bucketed per-bucket windows + broadcast offset joins; decile cut and curriculum key are pure projections"),
    ("s28_hard_negative_mining", "two corpus passes, each one scan: negatives rank-cut through WindowGroupLimit, positives a map-side-combinable MAX broadcast back — cheaper than one q_id-partitioned window over |Q| x corpus rows"),
    ("d34_semantic_dedup_seeded", "cell assignment is a narrow literal argmin fold; the only exchange keys on the SemDeDup blocking cell; dominator counts are one grouped aggregate over within-cell pairs"),
    ("s14_mmr_rerank", "the top-50 shortlist materializes ONCE (localCheckpoint shows as ExistingRDD) and feeds both sides of the broadcast pair self-join (LEFT, so singletons survive); the greedy runs per query group in one applyInPandas over integer-scaled sims"),
    ("s05b_ivf_seeded", "assignment is a narrow literal-fold projection over the scan (no exchange); probes join broadcast; the pruned within-cell scan rank-cuts via two-phase WindowGroupLimit — the corpus never shuffles"),
    ("p02b_flagship_retrieval_exact", "the whole reference dataflow: one Arrow embed crossing, query vector a driver literal, cosine fold in the projection, top-10 via TakeOrderedAndProject — no shuffle of losers"),
    ("d32b_pagerank_fixed_point", "per-round: one edge equi-join + one sum-by-destination hash aggregate (shuffle ∝ E), rank update a pure integer projection; rounds separated by localCheckpoint (ExistingRDD), dangling mass a collected literal"),
    ("p03b_embed_distinct_exact", "the UDF runs once per DISTINCT fingerprint (aggregate below the embed crossing); the join back carries hashes + vectors; posexplode is a narrow map"),
    ("p09b_rag_query_exact", "chunk+embed feed one persisted seam (InMemoryTableScan); the 50-row shortlist broadcasts into the pair BNLJ; the MMR kernel is one FlatMapGroupsInPandas; chunk-text fetch is a broadcast hash join"),
    ("s09b_pq_seeded", "encode is a narrow literal-fold projection (no exchange, 4 bytes of codes per vector); serving crossJoins broadcast per-query 64-entry LUTs — 4 array lookups + one integer add per row, no vector math on the corpus — and cuts via two-phase WindowGroupLimit"),
    ("s22b_projection_ann_seeded", "projection is a narrow 8-dot literal fold (no exchange); the coarse pass scans only (vec_id, 8 BIGINTs) against broadcast projected queries; the exact re-rank re-joins raw vectors by broadcast id join — the corpus never shuffles"),
    ("t23b_bpe_tokenize_exact", "one corpus pass collapses to (word, count); the pandas-UDF encode (ArrowEvalPython) runs on the DISTINCT vocabulary only; per-doc totals are a pure-JVM explode + join on word + one grouped sum"),
    ("m03b_png_features", "build -> PNG decode -> feature-reduce is one fused mapInPandas chain (single ArrowEvalPython span over the scan); only (doc_id, 8 ints) cross into the resize projection"),
    ("s06b_kmeans_cells_seeded", "the k-means assignment step alone: the operator's literal max-cosine fold as ONE narrow projection over the scan — no exchange, no Python, plan size fixed by k"),
    ("m07_gif_features", "build -> GIF LZW decode -> feature-reduce is one fused mapInPandas chain (single ArrowEvalPython span over the scan); only (doc_id, 6 ints) ever leave the scan partition"),
    ("s30_graph_beam_ann", "the serving walk never shuffles the corpus: the driver-bounded graph artifacts (edge + bit tables — the same tables the pre-r14 formulation broadcast into five hop joins) ride ONE broadcast into a single mapInPandas whose per-query integer beam loop emits only (q_id, vec_id, hamming) shortlist rows; the exact re-rank is s23's broadcast-id tail"),
    ("st38_stream_hamming_index_maintenance", "serving reads ONLY the compacted word table (ReadSchema = vec_id + two BIGINTs); the coarse popcount runs against the broadcast query words; raw vectors re-enter solely through the broadcast-id re-rank joins — the corpus parquet stays column-pruned"),
    ("st39_stream_graph_index_maintenance", "serving is s30's literal walk function over the MAINTAINED edge table (VersionedState parquet -> symmetrize -> localCheckpoint -> one broadcast into the per-query mapInPandas beam loop): q_id-keyed exchanges only, s23's broadcast-id re-rank tail — the maintenance ran earlier in foreachBatch and left nothing corpus-sized in this plan"),
]


def main() -> int:
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark import plans
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.session import (
        build_session,
    )

    spark = build_session(app_name="gen-explains", master="local[8]",
                          shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    out = [
        "# EXPLAINS — executed physical plans of the headline queries",
        "",
        "Auto-generated (`python tests/gen_explains.py`) at sf0.001 on "
        "local[8]. The plan-shape CONTRACTS live in "
        "`tests/test_plan_shapes.py` / `tests/test_partition_pruning.py`; "
        "this file exists so the plans can be read without running Spark. "
        "Numbers in `#N` suffixes are expression ids and vary run to run.",
        "",
    ]
    for name, note in HEADLINES:
        spec = plans.all_specs()[name]
        df = spec.build(spark, SF)
        # Execute THIS DataFrame's own query execution (collect; sf0.001
        # outputs are tiny) so AQE finalizes the adaptive plan — what's
        # captured is the plan that actually ran (isFinalPlan=true), not
        # the pre-execution static guess. A noop-sink write would spawn
        # a separate QueryExecution and leave this one unexecuted.
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        # Trim enormous plans to the structurally interesting prefix.
        lines = plan.rstrip().splitlines()
        if len(lines) > 80:
            lines = lines[:80] + [f"... ({len(lines) - 80} more lines)"]
        out.append(f"## {name}")
        out.append("")
        out.append(f"**What to see:** {note}")
        out.append("")
        out.append("```")
        out.extend(lines)
        out.append("```")
        out.append("")
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "EXPLAINS.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
