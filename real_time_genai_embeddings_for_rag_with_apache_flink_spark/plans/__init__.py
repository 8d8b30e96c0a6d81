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
# entries only. Round-7 window: the 8 entries new this round (never
# driver-checked), then every r02-checked entry (11), then 31 of the 40
# r03-checked entries — everything whose latest driver row predates the
# round-4/5 seam, skew-guard and state-partition refactors. The 9
# deferred r03 rows (q27/q29/q34/q40/q54 — pure scalar/pivot/subquery
# plans no refactor touched — plus m01/m02 multimodal and w03/w04's
# native session-window / plain interval-join plans, none of which any
# refactor touched) lead the round-8 window.
DRIVER_WINDOW: list[str] = [
    # new this round (never driver-checked)
    "st14b_stream_verified_neardups",
    "w12b_sketch_wau",
    "w13b_peak_concurrency_twophase",
    "t22_bpe_merge_learning",
    "t23_bpe_tokenize",
    "d29_bloom_decontamination",
    "t24_temperature_mixture",
    "st20_stream_quota_sampling",
    # stalest: last driver-checked in r02
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
    # next-stalest: last driver-checked in r03, all predating the
    # seam/skew/state refactors their plans now ride
    "d01_exact_dedup",
    "d02_ngram_jaccard",
    "d03_minhash_signatures",
    "d07_hash_sample",
    "d09_stratified_sample",
    "p02_flagship_retrieval",
    "s01_topk_cosine",
    "s02_knn_join",
    "s03_embedding_near_dup",
    "s04_label_centroids",
    "s05_ivf_search",
    "s07_scalar_quantization",
    "s08_hyperplane_lsh_buckets",
    "st03_stream_dedup",
    "st04_stream_filter_project",
    "st06_stateful_user_totals",
    "st09_stream_static_join",
    "st10_foreachbatch_upsert",
    "t01_text_stats",
    "t02_language_id",
    "t03_quality_scores",
    "t04_bpe_token_count",
    "t05_rolling_hash",
    "t06_doc_chunking",
    "t07_pii_redaction",
    "t08_corpus_mixture",
    "u01_grouped_agg_udaf",
    "u02_mapinpandas_tokens",
    "u03_grouped_map_zscore",
    "w01_tumbling_window",
    "w02_sliding_window",
]

set_priority(DRIVER_WINDOW)

__all__ = ["QuerySpec", "all_specs", "get_spec", "query", "set_priority", "DRIVER_WINDOW"]
