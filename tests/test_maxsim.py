"""s26's late-interaction algebra (operators/similarity.maxsim_scores —
the ONE copy the catalog entry, the bench stress pair, and these pins
all run), checked against a dense numpy reference: the relational
decomposition (cosine per pair -> MAX per (query, doc, token) ->
integer SUM per (query, doc)) must reproduce the textbook MaxSim score
computed with plain matmuls, at the same half-away-from-zero 1e-6
rounding Spark's F.round applies, on adversarial random data —
including docs with wildly different vector counts (the property the
map-side MAX's cardinality claim rests on) and negative similarities."""

from __future__ import annotations

import numpy as np

from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.similarity import (
    maxsim_scores,
)


def _scale_half_away(y):
    """round(y, 6) * 1e6 as an exact int with Spark's HALF_UP tie rule
    (away from zero) — np.round's half-even would categorically
    disagree on boundary cosines."""
    return np.copysign(np.floor(np.abs(y) * 1_000_000.0 + 0.5), y).astype(
        np.int64
    )


def _reference_maxsim(M, doc_of, T, q_of):
    """Dense MaxSim: scaled-integer score per (query, doc)."""
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    Tn = T / np.linalg.norm(T, axis=1, keepdims=True)
    sims = _scale_half_away(Mn @ Tn.T)
    scores = {}
    for q in sorted(set(q_of)):
        toks = [i for i, qq in enumerate(q_of) if qq == q]
        for d in sorted(set(doc_of)):
            rows = [i for i, dd in enumerate(doc_of) if dd == d]
            block = sims[np.ix_(rows, toks)]
            scores[(q, d)] = int(block.max(axis=0).sum())
    return scores


def _spark_maxsim(spark, M, doc_of, T, q_of):
    corpus = spark.createDataFrame(
        [(int(d), [float(x) for x in row]) for d, row in zip(doc_of, M)],
        "doc_label int, embedding array<double>",
    )
    tokens = spark.createDataFrame(
        [
            (int(q), int(i), [float(x) for x in T[i]])
            for i, q in enumerate(q_of)
        ],
        "q_id long, tok_id long, q_vec array<double>",
    )
    return {
        (r.q_id, r.doc_label): r.maxsim_scaled
        for r in maxsim_scores(corpus, tokens).collect()
    }


def test_maxsim_decomposition_matches_dense_reference(spark):
    rng = np.random.RandomState(4242)
    dim, n_tokens, n_queries = 16, 12, 3
    M = rng.standard_normal((120, dim))
    # ragged doc sizes: doc 0 gets half the vectors, doc 6 gets one
    doc_of = [0] * 60 + [1] * 20 + [2] * 15 + [3] * 10 + [4] * 8 + [5] * 6 + [6]
    T = rng.standard_normal((n_tokens, dim))
    q_of = [i % n_queries for i in range(n_tokens)]

    got = _spark_maxsim(spark, M, doc_of, T, q_of)
    want = _reference_maxsim(M, doc_of, T, q_of)
    assert got == want


def test_maxsim_single_vector_docs_reduce_to_cosine_sum(spark):
    """With exactly one vector per doc, MaxSim degenerates to the plain
    sum of query-token cosines — the single-vector retrieval s01 runs.
    Pins that the MAX stage is a true no-op there (no off-by-one in
    the grouping keys)."""
    rng = np.random.RandomState(7)
    dim = 8
    M = rng.standard_normal((5, dim))
    T = rng.standard_normal((4, dim))

    got = _spark_maxsim(spark, M, list(range(5)), T, [0, 0, 0, 0])

    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    Tn = T / np.linalg.norm(T, axis=1, keepdims=True)
    sims = _scale_half_away(Mn @ Tn.T)
    want = {(0, i): int(sims[i].sum()) for i in range(5)}
    assert got == want


def test_maxsim_null_embeddings_never_poison_a_doc(spark):
    """Null corpus vectors: cosine_similarity is null-safe (null in ->
    null out), aggregate MAX ignores nulls — so a doc with SOME null
    vectors scores from its real vectors only, and a doc with ONLY
    null vectors yields a null maxsim (never a zero that would rank it
    above negative-similarity docs)."""
    rng = np.random.RandomState(11)
    T = rng.standard_normal((2, 4))
    corpus = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (0, None),  # mixed doc: null vector must be ignored
            (1, None),  # all-null doc
            (1, None),
        ],
        "doc_label int, embedding array<double>",
    )
    tokens = spark.createDataFrame(
        [(0, i, [float(x) for x in T[i]]) for i in range(2)],
        "q_id long, tok_id long, q_vec array<double>",
    )
    got = {
        r.doc_label: r.maxsim_scaled for r in maxsim_scores(corpus, tokens).collect()
    }
    sims = _scale_half_away(
        (np.array([1.0, 0.0, 0.0, 0.0]) / 1.0)
        @ (T / np.linalg.norm(T, axis=1, keepdims=True)).T
    )
    assert got[0] == int(sims.sum())  # nulls ignored, real vector scores
    assert got[1] is None  # all-null doc is null, not zero


def test_st25_stream_serving_equals_batch_maxsim(spark):
    """st25 (r8 verdict item 7): the streamed late-interaction answers
    — queries scored in whichever trigger their token set completes,
    incomplete sets buffered across triggers — must equal the batch
    MaxSim over the whole token pool row-for-row, and the run must
    actually be multi-batch with answers landing in more than one
    trigger (i.e. the token buffer did real cross-batch work)."""
    from conftest import SF_SMOKE
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans import (
        get_spec,
    )
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans.streaming_queries import (
        _ST25_QPOOL,
        _ST25_TOKS,
        _ST25_TOPK,
        LAST_RESULT_DIRS,
        LAST_RUN_BATCHES,
    )
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.sources.batch import (
        load_table,
    )
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.streaming import (
        statefs,
    )

    streamed = (
        get_spec("st25_stream_maxsim_serving").build(spark, SF_SMOKE).collect()
    )
    assert LAST_RUN_BATCHES["st25"] >= 2, "fixture must replay multi-batch"

    em = load_table(spark, SF_SMOKE, "embeddings")
    qt = em.filter(F.col("vec_id") < _ST25_QPOOL).select(
        F.floor(F.col("vec_id") / _ST25_TOKS).cast("long").alias("q_id"),
        F.col("vec_id").alias("tok_id"),
        F.col("embedding").alias("q_vec"),
    )
    dv = em.filter(F.col("vec_id") >= _ST25_QPOOL).select(
        F.col("label").alias("doc_label"), "embedding"
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("maxsim_scaled").desc(), "doc_label"
    )
    batch = (
        maxsim_scores(dv, qt)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _ST25_TOPK)
        .collect()
    )
    key = lambda rows: {
        (r.q_id, r.doc_label, r.maxsim_scaled, r.rnk) for r in rows
    }
    assert key(streamed) == key(batch)

    # answers must span >= 2 trigger dirs: completeness really is
    # reached at different batches, not all served in one trigger
    answers_dir = LAST_RESULT_DIRS["st25"]
    nonempty = 0
    for name in statefs.listdir(spark, answers_dir):
        rows = (
            spark.read.schema(
                "q_id long, doc_label int, maxsim_scaled long, rnk int"
            )
            .parquet(f"{answers_dir}/{name}")
            .count()
        )
        nonempty += 1 if rows else 0
    assert nonempty >= 2, "all queries served in a single trigger"
