"""Benchmark harness: runs the headline catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

# r14 verdict #3: single timed runs on this box swing individual rows
# up to 6.5x under ambient steal bursts (s21_stress read 7.3 -> 47.2 s
# across same-tree runs), so every row is timed BENCH_RUNS times and
# the reported number is the MEDIAN of the timed runs; the per-run
# times land in the BENCH_LOCAL.json payload ("runs") so a noisy run
# self-identifies. The one-line JSON contract is unchanged — "queries"
# still maps name -> seconds (now the median) — fields are additive,
# and the band/ratio gates consume the medians.
BENCH_RUNS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
RUN_LOG: dict[str, list[float]] = {}


def timed_median(name: str, timings: dict[str, float], fn, pre=None) -> None:
    """Run ``fn`` BENCH_RUNS times (``pre`` before each, outside the
    clock), record every run in RUN_LOG and the median in timings."""
    runs: list[float] = []
    for _ in range(BENCH_RUNS):
        if pre is not None:
            pre()
        t0 = time.perf_counter()
        fn()
        runs.append(round(time.perf_counter() - t0, 4))
    RUN_LOG[name] = runs
    timings[name] = round(statistics.median(runs), 4)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    sf = _guess_sf(sf_dir)
    # Load provenance (r13 verdict #6): ambient-load attribution has
    # been prose in BASELINE.md; record the box's 1/5/15-min load at
    # start and end IN the artifact so a loaded run self-identifies.
    load_start = [round(x, 2) for x in os.getloadavg()]

    from real_time_genai_embeddings_for_rag_with_apache_flink_spark import plans
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.session import (
        build_session,
    )

    # Explicit driver heap: bench runs 60+ catalog rows plus the
    # deliberately pathological stress rows (the uncapped d04 builds
    # ~32M pairs) in ONE JVM; Spark's 1g local default sat at the edge
    # and OOM'd once session caches accumulated. Effective because
    # bench creates the process's first session. Overridable for
    # constrained hosts via SPARK_GRAFT_DRIVER_MEM.
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    spark = build_session(
        app_name="bench",
        master=f"local[{cpus}]",
        extra_conf={"spark.driver.memory": driver_mem},
    )
    spark.sparkContext.setLogLevel("ERROR")

    specs = {n: s for n, s in plans.all_specs().items() if s.bench}

    def force(df) -> None:
        # .count() lets Catalyst prune every unreferenced projection, so
        # projection-heavy queries would be under-measured. The noop sink
        # materializes every output column (full codegen + serialization)
        # while still writing nothing.
        df.write.format("noop").mode("overwrite").save()

    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans.llmops import (
        clear_intermediate_cache,
    )

    timings: dict[str, float] = {}
    for name, spec in sorted(specs.items()):
        # Warm run first (JVM/codegen/parquet footers), then measure the
        # steady-state execution BENCH_RUNS times and keep the median —
        # what a resident cluster would see, robust to one steal burst.
        # The dedup chain's session-persisted intermediates are cleared
        # before every run so each measurement pays the full cold cost
        # (numbers stay comparable with the pre-seam baselines).
        clear_intermediate_cache()
        force(spec.build(spark, sf_dir))
        timed_median(
            name,
            timings,
            lambda spec=spec: force(spec.build(spark, sf_dir)),
            pre=clear_intermediate_cache,
        )
        print(
            f"# {name}: {timings[name]:.3f}s (runs: "
            + ", ".join(f"{r:.3f}" for r in RUN_LOG[name])
            + ")",
            file=sys.stderr,
        )

    _skew_stress(spark, timings, force)
    _chain_stress(spark, timings)
    _sweep_stress(spark, timings)
    _bpe_stress(spark, timings)
    _pca_stress(spark, timings)
    _binary_stress(spark, timings)
    _maxsim_stress(spark, timings)
    _divergence_stress(spark, timings)
    _plaid_stress(spark, timings)
    _rank_stress(spark, timings)

    # Expectation bands (r9 verdict #6, generalized to the top-10 most
    # expensive catalog rows in r10 verdict #5): BASELINE.md's prose
    # bands become a post-run gate. Rows breathe with ambient load, so
    # outside-the-band is a loud warning recorded in the payload; >2x
    # past the band top gets ONE retry (r10 advice: a single noisy
    # timing must not destroy the run) and, if it persists, fails the
    # run AFTER the payload is written (exit nonzero, measurements
    # preserved). Band edges are quiet-box envelopes around the frozen
    # baseline and recent quiet readings, not targets — the low edge
    # only warns (a too-fast row may mean the query stopped doing its
    # work, worth eyes, never a failure).
    band_violations, hard_violations = _check_bands(
        spark, specs, sf_dir, timings, force
    )
    ratio_violations = _check_ratio_bands(timings)
    for msg in ratio_violations:
        print(f"# RATIO BAND WARNING: {msg}", file=sys.stderr)

    load_end = [round(x, 2) for x in os.getloadavg()]
    total = round(sum(timings.values()), 4)
    payload = json.dumps(
        {
            "metric": "catalog_bench_total",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf,
            "band_violations": band_violations,
            "ratio_violations": ratio_violations,
            "loadavg_start": load_start,
            "loadavg_end": load_end,
            "runs_per_row": BENCH_RUNS,
            "runs": RUN_LOG,
        }
    )
    # The driver's BENCH_r0N.json artifact keeps only the LAST 2000
    # stdout chars and parses the final line (r11: the ~8 KB payload
    # line arrived head-truncated, so parsed stayed null every round) —
    # persist the FULL per-query JSON next to the script (committed per
    # round), print it for human logs, then END stdout with a compact
    # line that fits the tail whole, so the driver artifact is
    # machine-parseable in place (r11 verdict #7).
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"),
        "w",
    ) as fh:
        fh.write(payload + "\n")
    print(payload)
    compact = {
        "metric": "catalog_bench_total",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "band_violations": band_violations,
        "ratio_violations": ratio_violations,
        "loadavg_start": load_start,
        "loadavg_end": load_end,
        "runs_per_row": BENCH_RUNS,
        "queries_file": "BENCH_LOCAL.json",
        "slowest_10": dict(
            sorted(timings.items(), key=lambda kv: -kv[1])[:10]
        ),
    }
    print(json.dumps(compact))
    if hard_violations:
        # after the payload: one noisy box must not destroy the data,
        # but a reproduced >2x drift must not pass silently either
        print(
            "# BAND FAILURE (reproduced on retry): "
            + "; ".join(hard_violations),
            file=sys.stderr,
        )
        return 1
    return 0


# Quiet-box expectation bands for the most expensive catalog rows plus
# the scheduling-dominated s21 (the r9 precedent), extended in r14 to
# the stress rows that dominate the total (the r13 driver run read
# s23_stress_pack at 17.0 s vs the 0.96 s quiet freeze and the
# absolute-band gate stayed silent because none of them were banded).
# Edges bracket the frozen BASELINE.md number and recent quiet
# readings; they flag structural drift, they are not perf targets.
_BANDS: dict[str, tuple[float, float]] = {
    # tops recalibrated to the r14 box epoch (BASELINE.md §r14: this
    # round's box runs ~1.3x the r13 freeze box on exchange-heavy rows;
    # envelopes bracket the min/max of four full quiet r14 runs with
    # ~30% headroom — cross-epoch drift detection is the ratio gate's
    # job, absolute bands exist to catch structural plan regressions)
    "st28_stream_dup_components": (6.0, 17.0),
    # r14 optimization round: rows whose plans changed this round get
    # RE-ENVELOPED edges bracketing the post-optimization quiet
    # readings (same ±30% headroom discipline) — the old low edges
    # would flag the legitimate speedups as too-fast warnings
    "d34_semantic_dedup_seeded": (1.2, 10.0),  # spread_compute (r14)
    "st14b_stream_verified_neardups": (4.0, 13.0),
    "d24_lsh_recall_audit": (4.0, 15.0),
    "p10_training_manifest": (3.0, 11.0),
    "st25_stream_maxsim_serving": (2.0, 12.5),  # corpus spread (r14)
    "st14_stream_incremental_dedup": (3.0, 13.0),
    "s25_retrieval_eval": (0.6, 7.0),  # spread_compute (r14)
    "d27_prefix_filter_join": (3.0, 10.5),
    "s20b_ivfadc_seeded": (2.5, 9.0),
    "s21_pca_projection": (0.5, 1.4),
    # the slowest stress rows previously outside the gate
    "d04_skew_guard_off": (8.0, 26.0),  # deliberately quadratic
    "d21_chain_stress": (4.5, 14.0),
    "w13_sweep_hot_onephase": (4.0, 12.5),
    "s26_stress_expr_100kx64tok": (5.0, 18.0),
    "plaid_stress_maxsim_full_200kx64tok": (1.5, 9.0),
    "rank_stress_naive_global_5m": (3.5, 11.0),
    "s23_stress_flatsum_1024d_5k": (1.5, 4.5),
    "s23_stress_pack1024d_20k": (0.4, 2.0),
    # r15 (r14 ADVICE): the two rows that dominated the r14 committed
    # freeze via steal bursts and had NO band — s21_stress read 32.6 s
    # frozen (median-of-3 quiet readings: 2.3-2.8 s; the old 7.3-8.2
    # "quiet" singles carried burst mass) and st23 12.9 s (quiet
    # 3.7-5.9; ~3.7 after the r15 state-partition change). Envelopes
    # bracket the quiet readings with the usual ~30%+ headroom so a
    # load-poisoned reading can never again freeze silently. Low edges
    # warn only; the r15 freezes read s21 at 2.3/2.8, hence 1.5.
    "s21_stress_pca_1024d_20k": (1.5, 16.0),
    "st23_stream_ivm": (1.5, 9.0),
    # the round-14 rows, re-enveloped after the optimization round's
    # cell-kernel build + per-query serving walk (quiet medians: s30
    # 3.95 s, st39 11.0 s on the r14-opt box)
    "s30_graph_beam_ann": (1.5, 14.0),
    "st39_stream_graph_index_maintenance": (5.0, 25.0),
    "st38_stream_hamming_index_maintenance": (2.0, 7.5),
    "d35_exact_dup_spans": (3.0, 12.0),
}

# Hazard-twin RATIO gate (r13 verdict #1): every stress pair exists to
# prove a structural claim — the scale-safe sibling is faster than the
# anti-pattern. Ambient CPU contention can invert the ABSOLUTE numbers
# when the twins run minutes apart (the r13 driver run read pack 17.0 s
# vs flatsum 15.7 s — the exact opposite of the 0.96 vs 2.62 quiet
# evidence), so the twin evidence must be gated, not just recorded:
# each entry is (fast_row, slow_row, max_ratio), with max_ratio set
# ~2x above the quiet-freeze ratio (0.11-0.37) so a clean box never
# trips while an inversion always does. Violations are recorded in the
# payload (ratio_violations) and shouted to stderr — they mean THIS
# RUN's stress evidence is load-poisoned and BASELINE.md's frozen
# quiet ratios are the numbers to trust; they do not fail the run
# (the box, not the code, is what inverted).
_RATIO_BANDS: dict[str, tuple[str, str, float]] = {
    "pack_vs_flatsum": (
        "s23_stress_pack1024d_20k",
        "s23_stress_flatsum_1024d_5k",
        0.70,
    ),
    "gemm_vs_expr": (
        "s26_stress_gemm_100kx64tok",
        "s26_stress_expr_100kx64tok",
        0.50,
    ),
    "twophase_vs_onephase": (
        "w13_sweep_hot_twophase",
        "w13_sweep_hot_onephase",
        0.60,
    ),
    "skew_guard_on_vs_off": (
        "d04_skew_guard_on",
        "d04_skew_guard_off",
        0.40,
    ),
    "bucketed_vs_naive_rank": (
        "rank_stress_bucketed_5m",
        "rank_stress_naive_global_5m",
        0.70,
    ),
}


def _check_ratio_bands(timings: dict[str, float]) -> list[str]:
    """The hazard-twin ratio gate. Pure on the timings dict so the
    loaded-r13-vs-quiet behavior is unit-testable without running the
    suite (tests/test_bench_gate.py)."""
    violations: list[str] = []
    for label, (fast, slow, max_ratio) in _RATIO_BANDS.items():
        tf, ts = timings.get(fast), timings.get(slow)
        if tf is None or ts is None or ts <= 0:
            continue
        ratio = tf / ts
        if ratio > max_ratio:
            violations.append(
                f"{label}: {fast}={tf:.3f}s / {slow}={ts:.3f}s = "
                f"{ratio:.2f} > {max_ratio} — the structural evidence "
                "this twin pair exists to provide is inverted on this "
                "run (load-poisoned); trust BASELINE.md's quiet ratios"
            )
    return violations


def _check_bands(
    spark, specs, sf_dir: str, timings: dict[str, float], force
) -> tuple[list[str], list[str]]:
    """Post-run expectation-band gate. Returns (all_violations,
    hard_violations): every outside-the-band reading is recorded; a
    reading >2x the band top is re-measured ONCE (ambient load on a
    shared box trips sub-second rows spuriously — r10 advice) and only
    counts as hard if the better of the two runs still exceeds 2x."""
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans.llmops import (
        clear_intermediate_cache,
    )

    violations: list[str] = []
    hard: list[str] = []
    for name, (lo, hi) in _BANDS.items():
        t = timings.get(name)
        if t is None or lo <= t <= hi:
            continue
        if t > 2 * hi and name in specs:
            clear_intermediate_cache()
            t0 = time.perf_counter()
            force(specs[name].build(spark, sf_dir))
            retry = round(time.perf_counter() - t0, 4)
            best = min(t, retry)
            timings[name] = best
            if best > 2 * hi:
                msg = (
                    f"{name}={t:.3f}s / retry {retry:.3f}s, both >2x the "
                    f"[{lo}, {hi}] s band top — structural drift, not load"
                )
                violations.append(msg)
                hard.append(msg)
                print(f"# BAND FAILURE: {msg}", file=sys.stderr)
                continue
            t = best
            if lo <= t <= hi:
                continue
        msg = f"{name}={t:.3f}s outside the [{lo}, {hi}] s band"
        violations.append(msg)
        print(f"# BAND WARNING: {msg}", file=sys.stderr)
    return violations, hard


def _skew_stress(spark, timings: dict[str, float], force) -> None:
    """Adversarial skew-guard stress rows: d04 on a synthetic
    template-spam corpus (one degenerate cluster of 4,000 identical
    documents + 500 distinct docs — the tests/test_lsh_skew_guard.py
    fixture at ~25x the spam mass) with the bucket cap ON (default 64:
    oversized buckets star-link, pairs stay linear) vs OFF (cap lifted
    via the spark.graft.lshBucketCap knob: the band self-join goes
    all-pairs, ~8M pairs per band in single buckets). The ratio is the
    measured value of the guard — recorded in BASELINE.md so the
    bounded-vs-quadratic claim is numbers, not argument. No warm pass
    (the quadratic side IS the cost being demonstrated); median of
    BENCH_RUNS cold-equivalent runs so one steal burst cannot invert
    the pair (the r13 driver run did exactly that)."""
    import tempfile

    from pyspark.sql import functions as F

    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans import (
        llmops,
    )

    sf_dir = tempfile.mkdtemp(prefix="skew_sf_")
    spam = "limited time offer buy cheap replica widgets now from our store " * 3
    uniq = [
        (100_000 + i, f"unique document number {i} about spark plans topic {i * 7} detail {i * 13}")
        for i in range(500)
    ]
    rows = [(i, spam) for i in range(4000)] + uniq
    (
        spark.createDataFrame(rows, "doc_id long, text string")
        .withColumn("lang", F.lit("en"))
        .withColumn("source", F.lit("stress"))
        .withColumn("n_chars", F.length("text"))
        .coalesce(4)
        .write.mode("overwrite")
        .parquet(os.path.join(sf_dir, "documents.parquet"))
    )
    for mode, cap in (("on", None), ("off", 100_000_000)):
        if cap is not None:
            spark.conf.set(llmops.LSH_BUCKET_CAP_CONF, str(cap))
        try:
            timed_median(
                f"d04_skew_guard_{mode}",
                timings,
                lambda: force(llmops.d04_minhash_lsh_pairs(spark, sf_dir)),
                pre=llmops.clear_intermediate_cache,
            )
        finally:
            if cap is not None:
                spark.conf.unset(llmops.LSH_BUCKET_CAP_CONF)
        print(
            f"# d04_skew_guard_{mode}: {timings[f'd04_skew_guard_{mode}']:.3f}s",
            file=sys.stderr,
        )
    llmops.clear_intermediate_cache()


def _chain_stress(spark, timings: dict[str, float]) -> None:
    """Adversarial deep-graph stress row: connected components on a
    4,096-hop path (the worst case for diameter-bound label
    propagation — d08's 20-round cap cannot even finish it, and an
    uncapped propagation would need 4,095 full edge-list shuffles).
    The alternating-star algorithm (d21, operators/graph.py) must
    label it exactly in O(log^2 n) alternations; the row records the
    wall time and BASELINE.md the round count. Median of BENCH_RUNS
    runs (the iteration count, not JIT warmth, dominates — the median
    guards against steal bursts, not cold code)."""
    from pyspark.sql import functions as F  # noqa: F401

    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.graph import (
        connected_components_star,
    )

    n = 4096
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a: long, id_b: long"
    ).coalesce(8)
    def run():
        labels = connected_components_star(edges)
        n_labeled = labels.count()
        bad = labels.filter("component != 0").limit(1).count()
        if bad or n_labeled != n:
            raise AssertionError(
                f"chain stress wrong: {n_labeled}/{n} nodes labeled, bad={bad}"
            )

    timed_median("d21_chain_stress", timings, run)
    print(
        f"# d21_chain_stress: {timings['d21_chain_stress']:.3f}s",
        file=sys.stderr,
    )


def _sweep_stress(spark, timings: dict[str, float]) -> None:
    """Adversarial hot-key sweep-line stress rows: peak concurrency
    over 1.5M events that ALL share one event_type — the topology where
    w13's per-key window form serializes its entire sort + running sum
    on a single task, and the two-phase range-bucketed decomposition
    (w13b, windows.sweep_line_peaks_twophase) spreads the same points
    over 32 parallel partial sweeps stitched by carry-in offsets. Both
    paths run to a 1-row answer that is asserted EQUAL (the ratio is
    only meaningful if the decomposition is exact); the pair of rows
    prices the hot-key hazard the same way d04_skew_guard prices the
    LSH bucket blowup. Median of BENCH_RUNS runs each (the serialized
    sort, not JIT warmth, dominates the one-phase side)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans.windows import (
        _sweep_points,
        sweep_line_peaks_twophase,
    )

    n = 1_500_000
    ev = (
        spark.range(n)
        .select(
            F.lit("hot").alias("event_type"),
            # id*7919 mod one week of seconds: duplicates + full-range
            # spread, deterministic
            F.timestamp_seconds(
                1_700_000_000 + (F.col("id") * 7919) % 604_800
            ).alias("ts"),
        )
        .repartition(32)
    )
    pts = _sweep_points(ev).persist()
    pts.count()  # materialize the input outside both timed regions

    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    res: dict[str, list] = {}

    def one():
        res["one"] = (
            pts.select("event_type", F.sum("delta").over(w).alias("conc"))
            .groupBy("event_type")
            .agg(F.max("conc").alias("peak_concurrency"))
            .collect()
        )

    def two():
        res["two"] = (
            sweep_line_peaks_twophase(pts, n_buckets=32)
            .select("event_type", "peak_concurrency")
            .collect()
        )

    timed_median("w13_sweep_hot_onephase", timings, one)
    timed_median("w13_sweep_hot_twophase", timings, two)
    pts.unpersist()
    if {tuple(r) for r in res["one"]} != {tuple(r) for r in res["two"]}:
        raise AssertionError(
            f"sweep stress mismatch: {res['one']} != {res['two']}"
        )
    for k in ("w13_sweep_hot_onephase", "w13_sweep_hot_twophase"):
        print(f"# {k}: {timings[k]:.3f}s", file=sys.stderr)


def _guess_sf(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return -1.0


def _bpe_stress(spark, timings: dict[str, float]) -> None:
    """Production-shaped tokenizer-induction stress row: the testdata
    vocabulary exhausts after ~90 merges, so the catalog's t22b row
    cannot demonstrate REAL merge depth. This row trains 1,000 merges
    over a synthetic 50k-word vocabulary (deterministic seed) through
    bpe_merges_local — the whole loop in one Arrow-fed task — and
    records wall-clock. The contrast that matters: the distributed
    per-round path (t22) prices ~0.3 s of Spark job overhead PER MERGE
    at this scale, i.e. ~5 minutes for the same 1,000 merges; the
    vocabulary-local trainer does the whole run in seconds because its
    per-merge cost is O(words containing the merged pair), not
    O(jobs). The DataFrame build is excluded (materialized before the
    clock starts), but the timed region still includes the
    repartition(1) shuffle, the Arrow transfer to the Python worker,
    and one Spark job launch — a small fixed overhead on top of the
    training loop; measure on a quiet box before comparing to the
    frozen baseline."""
    import random

    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.bpe import (
        bpe_merges_local,
    )

    rng = random.Random(8)
    alphabet = "abcdefghijklmnopqrst"
    wc: dict[str, int] = {}
    for _ in range(50_000):
        w = "".join(rng.choice(alphabet) for _ in range(rng.randint(3, 12)))
        wc[w] = wc.get(w, 0) + rng.randint(1, 50)
    vocab = spark.createDataFrame(list(wc.items()), "word string, n long").persist()
    vocab.count()

    def run():
        merges = bpe_merges_local(vocab, n_merges=1000)
        if len(merges) != 1000:
            raise AssertionError(
                f"t22b stress short-circuited: {len(merges)} merges != 1000"
            )

    timed_median("t22b_stress_1000merges_50kvocab", timings, run)
    vocab.unpersist()
    print(
        f"# t22b_stress: {timings['t22b_stress_1000merges_50kvocab']:.3f}s "
        f"for 1000 merges / {len(wc)} words",
        file=sys.stderr,
    )


def _pca_stress(spark, timings: dict[str, float]) -> None:
    """Production-width PCA fit: the catalog's s21 row runs at the
    testdata's 64 dims, but the reference's Titan v2 vectors are 1024-d
    (KDS-P/index-creation-function/lambda_function.py:66-70) — and the
    fit's driver partials grow as dim^2 (1024-d: 8 MiB of gram per
    Arrow batch), so the interesting number is the one-pass moment
    collection at REAL width. 20k synthetic 1024-d vectors generated
    executor-side (mapInPandas, seeded per batch — never shipped
    through py4j), materialized BEFORE the clock; the timed region is
    covariance partials + driver eigh + top-16 basis — the whole fit.
    """
    import numpy as np
    import pandas as pd

    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.pca import (
        pca_fit,
    )

    dim, n = 1024, 20_000

    def gen(it):
        for pdf in it:
            ids = pdf["id"].to_numpy()
            rng = np.random.RandomState(int(ids[0]) % (2**31))
            M = rng.standard_normal((len(ids), dim)) * 0.1
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": [r.tolist() for r in M]}
            )

    df = (
        spark.range(n)
        .repartition(32)
        .mapInPandas(gen, "vec_id long, embedding array<double>")
        .persist()
    )
    df.count()

    def run():
        W, vals, _ = pca_fit(df, "embedding", dim=dim, k=16)
        if W.shape != (dim, 16) or len(vals) != 16:
            raise AssertionError(
                f"pca stress bad fit: W {W.shape}, {len(vals)} eigenvalues"
            )

    timed_median("s21_stress_pca_1024d_20k", timings, run)
    df.unpersist()
    print(
        f"# s21_stress: {timings['s21_stress_pca_1024d_20k']:.3f}s "
        f"for {n} x {dim}d fit",
        file=sys.stderr,
    )


def _binary_stress(spark, timings: dict[str, float]) -> None:
    """Production-width binary quantization: s23's catalog row packs 64
    dims with the pure-codegen flat-sum expression (the right call at
    that width), but at Titan's 1024 dims the 1024 CASE terms exceed
    janino's method limits — whole-stage codegen FAILS COMPILE and
    Spark silently drops to interpreted evaluation. Two priced rows
    (the w13/w13b hazard-and-alternative pattern):

    - s23_stress_flatsum_1024d_5k — the HAZARD: flat-sum pack of just
      5k 1024-d vectors through the interpreted fallback;
    - s23_stress_pack1024d_20k — the scale path: Arrow/numpy packer
      (operators/similarity.pack_sign_words_arrow, bit-layout-equal by
      test) over 4x the rows, plus the full popcount coarse top-40 via
      the word-array fold (which stays codegen at ANY width).

    Same auto-switch philosophy as kmeans literal-vs-GEMM: the bench
    prices WHERE the expression path stops being the right answer."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.functions.vector import (
        pack_sign_bits,
    )
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.similarity import (
        hamming_words,
        pack_sign_words_arrow,
    )

    dim, n = 1024, 20_000

    def gen(it):
        for pdf in it:
            ids = pdf["id"].to_numpy()
            rng = np.random.RandomState(int(ids[0]) % (2**31))
            M = rng.standard_normal((len(ids), dim)) * 0.1
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": [r.tolist() for r in M]}
            )

    df = (
        spark.range(n)
        .repartition(32)
        .mapInPandas(gen, "vec_id long, embedding array<double>")
        .persist()
    )
    df.count()

    # hazard: interpreted-fallback flat-sum pack, 5k rows
    flat_words = [
        pack_sign_bits(F.col("embedding"), 32 * w + 1, 32 * w + 32).alias(f"b{w}")
        for w in range(32)
    ]
    small = df.filter(F.col("vec_id") < 5_000)
    timed_median(
        "s23_stress_flatsum_1024d_5k",
        timings,
        lambda: small.select("vec_id", *flat_words)
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )

    # scale path: arrow pack of all 20k + popcount coarse top-40 (the
    # pack's persist/count/unpersist lifecycle is part of the timed
    # region — it is the work the path does; unpersist is async/cheap)
    def pack_and_coarse():
        bits = pack_sign_words_arrow(df, dim=dim).persist()
        bits.count()
        qb = F.broadcast(
            bits.filter(F.col("vec_id") < 8).select(
                F.col("vec_id").alias("q_id"), F.col("words").alias("q_words")
            )
        )
        wc = Window.partitionBy("q_id").orderBy("hamming", "vec_id")
        shortlist = (
            bits.filter(F.col("vec_id") >= 8)
            .join(qb, F.lit(True))
            .select(
                "q_id",
                "vec_id",
                hamming_words(F.col("words"), F.col("q_words")).alias(
                    "hamming"
                ),
            )
            .withColumn("crank", F.row_number().over(wc))
            .filter(F.col("crank") <= 40)
        )
        n_rows = shortlist.count()
        bits.unpersist()
        if n_rows != 8 * 40:
            raise AssertionError(f"binary stress shortlist {n_rows} rows")

    timed_median("s23_stress_pack1024d_20k", timings, pack_and_coarse)
    df.unpersist()
    print(
        f"# s23_stress: flatsum(5k) {timings['s23_stress_flatsum_1024d_5k']:.3f}s"
        f"  arrow(20k)+coarse {timings['s23_stress_pack1024d_20k']:.3f}s",
        file=sys.stderr,
    )



def _gemm_maxsim_scored(corpus, Tn, q_ids):
    """Shared Arrow-GEMM MaxSim kernel (the s26 scale path), used by
    BOTH the s26 expr-vs-GEMM stress pair and the s28 PLAID pruning
    trio so the integer-rounding contract lives in exactly one place:
    per Arrow batch, L2-normalize the rows, score every token in one
    (batch x tokens) matmul, round half-AWAY-from-zero at 1e-6 (Spark
    F.round is HALF_UP; np.round is half-even, which would disagree on
    boundary cosines), and reduce to the per-batch partial MAX inside
    the task before anything crosses the Exchange. ``Tn`` must carry
    L2-normalized token rows; ``q_ids[i]`` is token i's query."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import functions as F

    n_tokens = len(q_ids)

    def gemm_maxsim(it):
        for pdf in it:
            M = np.asarray([np.asarray(v) for v in pdf["embedding"]])
            M = M / np.linalg.norm(M, axis=1, keepdims=True)
            raw = M @ Tn.T  # (batch, n_tokens)
            sims = np.copysign(
                np.floor(np.abs(raw) * 1_000_000.0 + 0.5), raw
            ).astype(np.int64)
            out = pd.DataFrame(
                {
                    "doc_id": np.repeat(pdf["doc_id"].to_numpy(), n_tokens),
                    "q_id": np.tile(q_ids, len(pdf)),
                    "tok_id": np.tile(np.arange(n_tokens), len(pdf)),
                    "tok_sim": sims.reshape(-1),
                }
            )
            yield (
                out.groupby(["q_id", "doc_id", "tok_id"], as_index=False)
                .agg(tok_sim=("tok_sim", "max"))
            )

    return (
        corpus.mapInPandas(
            gemm_maxsim,
            "doc_id long, q_id long, tok_id long, tok_sim long",
        )
        .groupBy("q_id", "doc_id", "tok_id")
        .agg(F.max("tok_sim").alias("tok_sim"))
        .groupBy("q_id", "doc_id")
        .agg(F.sum("tok_sim").alias("maxsim_scaled"))
    )


def _maxsim_stress(spark, timings: dict[str, float]) -> None:
    """Late-interaction MaxSim at retrieval-serving scale: the catalog
    s26 scores 500 vectors against 32 query tokens with the pure-codegen
    cosine fold — the right call at that size. At serving scale the
    expression path pays one 64-term fold per (vector, token) NLJ row:
    100k vectors x 64 tokens = 6.4M folds, and every one of those rows
    crosses an Exchange into the (query, doc, token) MAX. The scale
    path computes ALL 64 token sims per vector in ONE numpy GEMM per
    Arrow batch and reduces to the per-batch partial MAX inside the
    task, so only |docs-in-batch| x |tokens| rows ever leave Python —
    the kmeans literal-vs-GEMM auto-switch philosophy applied to the
    retrieval read path. Both paths' final top-k manifests are asserted
    EQUAL (same round-6 integer discipline as the catalog row) before
    either is timed."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.similarity import (
        maxsim_scores,
    )

    dim, n, n_tokens, n_queries, n_docs = 64, 100_000, 64, 8, 2_000

    def gen(it):
        for pdf in it:
            ids = pdf["id"].to_numpy()
            rng = np.random.RandomState(int(ids[0]) % (2**31))
            M = rng.standard_normal((len(ids), dim))
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": [r.tolist() for r in M]}
            )

    corpus = (
        spark.range(n)
        .repartition(32)
        .mapInPandas(gen, "vec_id long, embedding array<double>")
        .withColumn("doc_id", F.col("vec_id") % n_docs)
        .persist()
    )
    corpus.count()
    tok_rng = np.random.RandomState(7)
    T = tok_rng.standard_normal((n_tokens, dim))
    tok_rows = [
        (int(i % n_queries), int(i), [float(x) for x in T[i]])
        for i in range(n_tokens)
    ]
    tokens = spark.createDataFrame(
        tok_rows, "q_id long, tok_id long, q_vec array<double>"
    )

    def topk(scored):
        w = Window.partitionBy("q_id").orderBy(
            F.col("maxsim_scaled").desc(), "doc_id"
        )
        return (
            scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= 10)
        )

    # expression path: the catalog s26 algebra (one shared copy),
    # broadcast NLJ fan-out, one cosine fold per row
    expr_scored = maxsim_scores(corpus, tokens, doc_col="doc_id")

    # GEMM path: the shared kernel (_gemm_maxsim_scored) — all token
    # sims per vector in one matmul per Arrow batch, partial MAX
    # reduced INSIDE the task before anything moves
    Tn = T / np.linalg.norm(T, axis=1, keepdims=True)
    q_ids = np.arange(n_tokens) % n_queries
    gemm_scored = _gemm_maxsim_scored(corpus, Tn, q_ids)

    key = lambda rows: {(r.q_id, r.doc_id, r.rnk) for r in rows}
    # explicit raise (not a bare assert): python -O must not publish
    # timings for two paths never proven equal
    if key(topk(expr_scored).collect()) != key(topk(gemm_scored).collect()):
        raise AssertionError("expression and GEMM MaxSim top-k must agree")

    timed_median(
        "s26_stress_expr_100kx64tok",
        timings,
        lambda: topk(expr_scored).write.format("noop").mode("overwrite").save(),
    )
    timed_median(
        "s26_stress_gemm_100kx64tok",
        timings,
        lambda: topk(gemm_scored).write.format("noop").mode("overwrite").save(),
    )
    corpus.unpersist()


def _divergence_stress(spark, timings: dict[str, float]) -> None:
    """t25 at production vocabulary scale: the catalog row runs on the
    31-token synthetic corpus, so this prices the REAL cost shape —
    20 sources x ~100k-token vocabularies with heavy overlap (every
    token lives in 2-20 sources), generated executor-side as the
    (source, token, cnt) count table the corpus pass would produce
    (the corpus scan itself is priced by every other t-row). The
    token-keyed pair join fans each token out to the source pairs
    that BOTH contain it — ~7M pair terms here (E[C(k,2)] = 70 per
    token at k uniform on 2..20) — and the per-pair
    aggregate collapses them to 190 rows. Runs the SAME
    js_divergence_matrix the catalog entry runs."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import functions as F

    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans.curation import (
        js_divergence_matrix,
    )

    n_tokens, n_sources = 100_000, 20

    def gen(it):
        for pdf in it:
            ids = pdf["id"].to_numpy()
            rng = np.random.RandomState(int(ids[0]) % (2**31))
            rows = {"source": [], "token": [], "cnt": []}
            for t in ids:
                # each token appears in 2..20 sources with Zipf-ish counts
                k = 2 + int(rng.randint(0, n_sources - 1))
                for srcid in rng.choice(n_sources, size=k, replace=False):
                    rows["source"].append(f"src{srcid}")
                    rows["token"].append(f"tok{t}")
                    rows["cnt"].append(int(1 + rng.zipf(2.0) % 1000))
            yield pd.DataFrame(rows)

    counts = (
        spark.range(n_tokens)
        .repartition(32)
        .mapInPandas(gen, "source string, token string, cnt long")
        .persist()
    )
    counts.count()
    timed_median(
        "t25_stress_100kvocab_20src",
        timings,
        lambda: js_divergence_matrix(counts)
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )
    counts.unpersist()




def _rank_stress(spark, timings: dict[str, float]) -> None:
    """Exact global ROW_NUMBER at stress size, both ways: the naive
    single-partition window (every row through ONE task — the plan a
    bare ``ROW_NUMBER() OVER (ORDER BY ...)`` gives you) vs
    operators/ranking.distributed_rank (quantile-cut value buckets +
    parallel per-bucket windows + broadcast offsets — the t26
    primitive). 5M synthetic rows generated executor-side; before
    timing, both arms must produce the same exact integer checksum
    (sum over rows of rank * (id % 1009)) — raised on violation, so
    the priced pair is provably computing the same answer."""
    import time

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.ranking import (
        distributed_rank,
    )

    n = 5_000_000
    base = (
        spark.range(n)
        .select(
            F.col("id"),
            ((F.col("id") * 2654435761) % 1_000_000).alias("k"),
        )
        .persist()
    )
    base.count()

    def checksum(df) -> int:
        return df.select(
            F.sum(F.col("rnk") * (F.col("id") % 1009)).alias("c")
        ).collect()[0]["c"]

    naive = base.withColumn(
        "rnk", F.row_number().over(Window.orderBy("k", "id"))
    )
    bucketed = distributed_rank(base, ["k", "id"], "rnk")
    c1, c2 = checksum(naive), checksum(bucketed)
    if c1 != c2:
        raise RuntimeError(f"rank stress checksum mismatch: {c1} != {c2}")

    timed_median(
        "rank_stress_naive_global_5m",
        timings,
        lambda: naive.write.format("noop").mode("overwrite").save(),
    )
    timed_median(
        "rank_stress_bucketed_5m",
        timings,
        lambda: distributed_rank(base, ["k", "id"], "rnk")
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )
    base.unpersist()
    print(
        f"# rank_stress: naive {timings['rank_stress_naive_global_5m']:.2f}s "
        f"vs bucketed {timings['rank_stress_bucketed_5m']:.2f}s",
        file=sys.stderr,
    )


def _plaid_stress(spark, timings: dict[str, float]) -> None:
    """Late-interaction retrieval with CENTROID-BOUND pruning — the
    PLAID decomposition (Santhanam et al. 2022) made EXACT: per doc, a
    centroid direction and an angular radius r = max angle(centroid,
    vector); for a query token t, every vector v of the doc satisfies
    angle(t, v) >= angle(t, centroid) - r (spherical triangle
    inequality), so cos(max(0, angle(t, c) - r)) is a PROVABLE upper
    bound on the token's MaxSim contribution. Summing per-token bounds
    gives a per-(query, doc) upper bound computed from |docs| centroids
    instead of |vectors| embeddings; only the top-C docs by bound pay
    exact MaxSim, and the run carries a CERTIFICATE — the (C+1)-th
    bound must be strictly below the k-th exact score — so the pruned
    top-k is exact by proof, not by recall. Both the certificate and
    top-k equality with the unpruned GEMM path raise on violation
    before any timing is published.

    The catalog can't host this row: the testdata embeddings are
    near-isotropic (per-group radii ~85 deg, centroids ~90 deg apart
    — measured round 9), so NO centroid bound prunes anything there
    and an sf-table entry would be a fallback-to-full-scan in
    disguise. Production late-interaction corpora are the opposite
    (ColBERT vectors cluster; PLAID exists because of it), so the
    stress trio prices the honest case: 200k vectors in 40,000 docs of
    5 vectors each around 64 archetype directions (~14 deg intra-doc
    spread), 64 query tokens targeting 8 of the archetypes.

    Pruned-path pricing INCLUDES the index build (centroid + radius
    pass) — in production it amortizes across queries, so the measured
    ratio understates the serving win."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    # width must exceed the per-archetype doc count (n_docs / n_arch
    # ~= 625): every same-cluster doc carries a near-max bound, so the
    # certificate can only separate once the shortlist swallows the
    # whole matching cluster — exactly PLAID's candidate-generation
    # sizing rule. Doc count is the pruning lever: the full path's cost
    # is the |docs| x |tokens| post-combine aggregate (2.56M rows
    # here), the pruned path's is |shortlist| x |tokens| (~393k for 8
    # disjoint-archetype queries) plus a docs-sized bounds pass
    dim, n, n_tokens, n_queries, n_docs, k, width = 64, 200_000, 64, 8, 40_000, 10, 768
    n_arch = 64
    arch = np.random.RandomState(3).standard_normal((n_arch, dim))
    arch /= np.linalg.norm(arch, axis=1, keepdims=True)

    def gen(it):
        for pdf in it:
            ids = pdf["id"].to_numpy()
            rng = np.random.RandomState(int(ids[0]) % (2**31))
            doc = ids % n_docs
            # noise sigma scaled by 1/sqrt(dim): total noise NORM ~0.25
            # against unit archetypes (~14 deg intra-doc spread); an
            # unscaled 0.25/component would have norm 2 and swamp the
            # signal back to isotropy
            M = arch[doc % n_arch] + (0.25 / np.sqrt(dim)) * rng.standard_normal(
                (len(ids), dim)
            )
            M /= np.linalg.norm(M, axis=1, keepdims=True)
            yield pd.DataFrame(
                {
                    "vec_id": ids,
                    "doc_id": doc,
                    "embedding": [r.tolist() for r in M],
                }
            )

    corpus = (
        spark.range(n)
        .repartition(32)
        .mapInPandas(gen, "vec_id long, doc_id long, embedding array<double>")
        .persist()
    )
    corpus.count()

    tok_rng = np.random.RandomState(11)
    T = arch[np.arange(n_tokens) % n_queries] + (
        0.1 / np.sqrt(dim)
    ) * tok_rng.standard_normal((n_tokens, dim))
    T /= np.linalg.norm(T, axis=1, keepdims=True)
    q_ids = np.arange(n_tokens) % n_queries

    def scored_from(src):
        # the shared GEMM kernel; T is already L2-normalized here
        return _gemm_maxsim_scored(src, T, q_ids)

    def topk(scored):
        w = Window.partitionBy("q_id").orderBy(
            F.col("maxsim_scaled").desc(), "doc_id"
        )
        return (
            scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
        )

    # -- full path (the s26 GEMM scale path, no pruning) ----------------
    res: dict[str, object] = {}

    def full_run():
        res["full"] = topk(scored_from(corpus)).collect()

    timed_median("plaid_stress_maxsim_full_200kx64tok", timings, full_run)

    # -- pruned path (index build + bounds + shortlist + exact) ---------
    def centroid_radius(it):
        for pdf in it:
            # one partition arrives as one batch here (6,250 rows <
            # the 10k Arrow batch default) and docs are hash-collected
            # per partition, so every doc's vectors are complete
            M = np.asarray([np.asarray(v) for v in pdf["embedding"]])
            doc = pdf["doc_id"].to_numpy()
            rows = []
            for d in np.unique(doc):
                V = M[doc == d]
                c = V.mean(axis=0)
                c /= np.linalg.norm(c)
                rows.append((int(d), c.tolist(), float((V @ c).min())))
            yield pd.DataFrame(
                rows, columns=["doc_id", "centroid", "cos_min"]
            )

    def bounds(it):
        # per doc: ub(t, d) = cos(max(0, angle(t, c) - r)) + integer
        # margin; summed per query -> one (q_id, doc_id, ub_scaled) row
        for pdf in it:
            C = np.asarray([np.asarray(c) for c in pdf["centroid"]])
            r = np.arccos(np.clip(pdf["cos_min"].to_numpy(), -1.0, 1.0))
            theta = np.arccos(np.clip(C @ T.T, -1.0, 1.0))  # (docs, toks)
            ub = np.cos(np.maximum(0.0, theta - r[:, None]))
            ub_scaled = np.floor(ub * 1_000_000.0).astype(np.int64) + 2
            per_q = np.zeros((len(C), n_queries), dtype=np.int64)
            for q in range(n_queries):
                per_q[:, q] = ub_scaled[:, q_ids == q].sum(axis=1)
            yield pd.DataFrame(
                {
                    "doc_id": np.repeat(pdf["doc_id"].to_numpy(), n_queries),
                    "q_id": np.tile(np.arange(n_queries), len(C)),
                    "ub_scaled": per_q.reshape(-1),
                }
            )

    # build phase (offline in production — centroids/radii/bounds are
    # per-corpus, amortized across every query that ever arrives).
    # Each timed build run produces a fresh persisted index; the prior
    # run's pinned intermediates are released inside the run (async
    # unpersist, negligible) so BENCH_RUNS runs never stack copies.
    state: dict[str, object] = {}

    def build_run():
        cr = (
            corpus.repartition(32, "doc_id")
            .mapInPandas(
                centroid_radius,
                "doc_id long, centroid array<double>, cos_min double",
            )
            .persist()
        )
        # the centroid pass assumes each hash partition arrives as ONE
        # Arrow batch (6,250 rows < the 10k default) so no doc straddles
        # batches; a violated assumption would emit duplicate per-doc
        # rows with partial radii — invalid bounds that would surface
        # later as a confusing certificate failure. Assert where it
        # breaks.
        n_cent = cr.count()
        if n_cent != n_docs:
            raise AssertionError(
                f"centroid pass emitted {n_cent} rows for {n_docs} docs — a "
                "doc straddled Arrow batches; lower partitions or raise "
                "spark.sql.execution.arrow.maxRecordsPerBatch"
            )
        cents = cr.mapInPandas(
            bounds, "doc_id long, q_id long, ub_scaled long"
        )
        wb = Window.partitionBy("q_id").orderBy(F.desc("ub_scaled"), "doc_id")
        ranked_ub = cents.withColumn(
            "ubrank", F.row_number().over(wb)
        ).persist()
        shortlist = (
            ranked_ub.filter(F.col("ubrank") <= width)
            .select("q_id", "doc_id")
            .persist()
        )
        shortlist.count()
        ub_next = {
            r.q_id: r.ub_scaled
            for r in ranked_ub.filter(F.col("ubrank") == width + 1).collect()
        }
        for key in ("cr", "ranked_ub", "shortlist"):
            if key in state:
                state[key].unpersist()
        state.update(
            cr=cr, ranked_ub=ranked_ub, shortlist=shortlist, ub_next=ub_next
        )

    timed_median("plaid_stress_build", timings, build_run)

    # serve phase (the per-query-batch cost a running deployment pays)
    def serve_run():
        shortlist = state["shortlist"]
        cand_docs = shortlist.select("doc_id").distinct()
        pruned_scored = scored_from(
            corpus.join(F.broadcast(cand_docs), "doc_id")
        ).join(F.broadcast(shortlist), ["q_id", "doc_id"])
        state["pruned"] = topk(pruned_scored).collect()

    timed_median("plaid_stress_serve", timings, serve_run)
    state["ranked_ub"].unpersist()
    state["shortlist"].unpersist()
    state["cr"].unpersist()
    corpus.unpersist()

    pruned = state["pruned"]
    kth = {}
    for r in pruned:
        if r.rnk == k:
            kth[r.q_id] = r.maxsim_scaled
    for q, nxt in state["ub_next"].items():
        if not (nxt < kth[q]):
            raise AssertionError(
                f"pruning certificate failed for q={q}: "
                f"ub_next={nxt} >= kth_exact={kth[q]}"
            )
    keyf = lambda rows: {(r.q_id, r.doc_id, r.rnk) for r in rows}
    if keyf(pruned) != keyf(res["full"]):
        raise AssertionError("pruned and full MaxSim top-k must agree")



if __name__ == "__main__":
    raise SystemExit(main())
