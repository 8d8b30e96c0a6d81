"""MMR re-rank invariants (plans/retrieval.mmr_select).

The greedy selection has no SQL oracle, so its contract is pinned here:
a hand-computed small case, determinism, and the structural invariants
every MMR implementation must satisfy.
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
