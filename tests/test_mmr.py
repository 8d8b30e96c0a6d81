"""MMR re-rank invariants (plans/retrieval.mmr_select and
mmr_select_exact).

The float numpy kernel (mmr_select — BLAS accumulation, general
raw-vector callers like p09) keeps its contract pinned here: a
hand-computed small case, determinism, and the structural invariants
every MMR implementation must satisfy. The integer kernel
(mmr_select_exact, round 10) additionally carries the s14 DuckDB
oracle; these tests pin its hand case, exactness, and the singleton
edge both at the kernel and end-to-end against the real oracle.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMOKE


def _toy_cands(spark):
    # query direction = x-axis. vecs 1 and 2 are near-duplicates of
    # each other (both close to x), vec 3 is diverse but still relevant.
    rows = [
        (0, 1, [1.0, 0.0], 1.0),
        (0, 2, [0.999, 0.0447], 0.999),
        (0, 3, [0.6, 0.8], 0.6),
    ]
    return spark.createDataFrame(
        rows, "q_id bigint, vec_id bigint, embedding array<double>, sim double"
    )


def test_mmr_hand_case_prefers_diversity(spark):
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans.retrieval import (
        mmr_select,
    )

    out = mmr_select(_toy_cands(spark), k=3, lam=0.3).orderBy("rank").collect()
    picked = [r.vec_id for r in out]
    # pick 1: highest sim -> vec 1. pick 2 at lam=0.3: vec 2 is a
    # near-dup of vec 1 (cos ~0.999), mmr = 0.3*0.999 - 0.7*0.999
    # = -0.3996, while the diverse vec 3 scores 0.3*0.6 - 0.7*0.6
    # = -0.24 -> vec 3 wins despite the lower query similarity.
    assert picked == [1, 3, 2]
    # first pick's mmr score is lam * sim exactly
    assert math.isclose(out[0].mmr, 0.3 * 1.0, rel_tol=1e-9)


def test_mmr_invariants_on_testdata(spark):
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans import (
        get_spec,
    )

    spec = get_spec("s14_mmr_rerank")
    out = spec.build(spark, SF_SMOKE).orderBy("rank").collect()
    assert len(out) == 10
    ids = [r.vec_id for r in out]
    assert len(set(ids)) == 10  # no repeats
    assert [r.rank for r in out] == list(range(1, 11))
    # rank 1 is the plain cosine argmax (MMR's first pick ignores
    # redundancy); its sim must be the max sim in the output
    assert out[0].sim == max(r.sim for r in out)
    # deterministic: a second run returns the identical selection
    again = [r.vec_id for r in spec.build(spark, SF_SMOKE).orderBy("rank").collect()]
    assert again == ids


def test_mmr_k_larger_than_group(spark):
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans.retrieval import (
        mmr_select,
    )

    out = mmr_select(_toy_cands(spark), k=99).collect()
    assert len(out) == 3  # bounded by the candidate count, no crash


def _toy_pairs(spark, scale=1_000_000):
    """The _toy_cands case pre-scored for mmr_select_exact: qs/ps are
    6-dp-scaled integer cosines (here the toy sims are exact)."""
    import numpy as np

    vecs = {1: [1.0, 0.0], 2: [0.999, 0.0447], 3: [0.6, 0.8]}
    qs = {1: 1.0, 2: 0.999, 3: 0.6}

    def cos(a, b):
        a, b = np.asarray(a), np.asarray(b)
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    rows = []
    for a in vecs:
        for b_ in vecs:
            if a == b_:
                continue
            rows.append(
                (
                    0,
                    a,
                    int(round(qs[a] * scale)),
                    b_,
                    int(round(round(cos(vecs[a], vecs[b_]), 6) * scale)),
                )
            )
    return spark.createDataFrame(
        rows, "q_id bigint, vec_id bigint, qs bigint, b_id bigint, ps bigint"
    )


def test_mmr_exact_matches_hand_case_and_is_integer_pure(spark):
    """mmr_select_exact (the s14 oracle-certified kernel) picks the
    same diversity-preferring sequence as the float kernel on the hand
    case at lambda 3/10, and its scores are exact integer arithmetic
    divided once at the end."""
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans.retrieval import (
        mmr_select_exact,
    )

    out = (
        mmr_select_exact(_toy_pairs(spark), k=3, lam_num=3, lam_den=10)
        .orderBy("rank")
        .collect()
    )
    assert [r.vec_id for r in out] == [1, 3, 2]
    # first pick: mmr = 3*qs/1e7 = 0.3 exactly
    assert out[0].mmr == 0.3
    assert out[0].sim == 1.0
    # second pick (vec 3): 3*600000 - 7*ps(3,1); ps(3,1) = cos = 0.6
    assert out[1].mmr == (3 * 600000 - 7 * 600000) / 1e7


def test_mmr_exact_singleton_group(spark):
    """A candidate with no pairs (NULL b_id via the caller's left
    join) still gets selected with mmr = lam*sim."""
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans.retrieval import (
        mmr_select_exact,
    )

    df = spark.createDataFrame(
        [(5, 9, 800000, None, None)],
        "q_id bigint, vec_id bigint, qs bigint, b_id bigint, ps bigint",
    )
    out = mmr_select_exact(df, k=10).collect()
    assert len(out) == 1
    assert (out[0].q_id, out[0].vec_id, out[0].rank) == (5, 9, 1)
    assert out[0].mmr == 7 * 800000 / 1e7


def test_stream_events_time_parity(spark):
    """Regression for the round-3 driver reds: the streaming events
    source must decode ts to the SAME wall clock as the batch loader,
    whatever parquet encoding the testdata ships with (NANOS-as-long
    vs MICROS). A silent 1000x compression here poisons every
    watermark/window result while still 'running' green."""
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans.streaming_queries import (
        run_to_memory,
        stream_events,
    )
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.sources.batch import (
        load_table,
    )

    ev = stream_events(spark, SF_SMOKE).select(
        F.col("ts").cast("timestamp_ntz").alias("ts")
    )
    landed = run_to_memory(
        ev.groupBy().agg(
            F.min("ts").alias("lo"), F.max("ts").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        ),
        "ts_parity",
        "complete",
    ).collect()[0]
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .agg(
            F.min("ts").alias("lo"), F.max("ts").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()[0]
    )
    assert landed.n == batch.n
    assert landed.lo == batch.lo
    assert landed.hi == batch.hi


def test_s14_singleton_shortlist_matches_oracle(spark, tmp_path):
    """r10 second-review finding: the pair self-join must be a LEFT
    join — a 1-candidate shortlist used to produce zero kernel input
    (s14 empty) while the oracle's pairless sel1 returned the
    candidate. Pinned end-to-end on a 1-candidate fixture against the
    REAL oracle."""
    import os

    import duckdb

    from oracle_harness import compare

    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans import (
        get_spec,
    )

    root = str(tmp_path)
    rows = [(0, [1.0] * 64, 1), (7, [0.5] * 64, 2)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(root, "embeddings.parquet")
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM read_parquet("
        f"'{os.path.join(root, 'embeddings.parquet')}/*.parquet')"
    )
    spec = get_spec("s14_mmr_rerank")
    res = compare("s14_singleton", spec.build(spark, root), con, spec.oracle)
    assert res.strict_ok, res.detail
    out = spec.build(spark, root).collect()
    assert [(r.q_id, r.rank, r.vec_id, r.sim, r.mmr) for r in out] == [
        (0, 1, 7, 1.0, 0.7)
    ]
