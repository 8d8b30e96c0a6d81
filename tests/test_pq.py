"""Product quantization (operators/pq.py) pinned against a numpy
reference: identical deterministic training, identical codes, and a
recall floor for ADC search vs exact squared-L2 top-k."""

from __future__ import annotations

import numpy as np
import pytest

from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.pq import (
    pq_encode,
    pq_search,
    pq_train,
)
from real_time_genai_embeddings_for_rag_with_apache_flink_spark.sources.batch import (
    load_table,
)

SF = "/root/testdata/sf0.001"
# 16 subspaces of 4 dims: the testdata embeddings are near-uniform, so
# coarse subspaces (few, wide) lose neighbor resolution — finer
# subspaces trade storage (16 vs 4 bytes/vector) for recall.
DIM, M, K, ITERS = 64, 16, 16, 2


def _numpy_reference(vecs: np.ndarray, order: np.ndarray):
    """Replica of pq_train/pq_encode: init from the k lowest-id rows,
    Lloyd updates with empty cells keeping their centroid, ties to the
    lowest code."""
    sub = DIM // M
    books = [
        vecs[order[:K], s * sub : (s + 1) * sub].astype(np.float64).copy()
        for s in range(M)
    ]
    for _ in range(ITERS):
        for s in range(M):
            x = vecs[:, s * sub : (s + 1) * sub].astype(np.float64)
            d = ((x[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
            codes = d.argmin(axis=1)  # argmin takes the first (lowest) index
            for c in range(K):
                mask = codes == c
                if mask.any():
                    books[s][c] = x[mask].mean(axis=0)
    codes = np.stack(
        [
            (
                (
                    vecs[:, s * sub : (s + 1) * sub].astype(np.float64)[:, None, :]
                    - books[s][None, :, :]
                )
                ** 2
            )
            .sum(axis=2)
            .argmin(axis=1)
            for s in range(M)
        ],
        axis=1,
    )
    return books, codes


@pytest.fixture(scope="module")
def corpus(spark):
    emb = load_table(spark, SF, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    order = np.argsort(ids, kind="stable")
    vecs = np.array([r.embedding for r in rows], dtype=np.float32)[order]
    ids = ids[order]
    return emb, ids, vecs


def test_pq_codes_match_numpy(spark, corpus):
    emb, ids, vecs = corpus
    books = pq_train(emb, dim=DIM, m=M, k=K, iterations=ITERS)
    np_books, np_codes = _numpy_reference(vecs, np.arange(len(ids)))
    for s in range(M):
        np.testing.assert_allclose(
            np.array(books[s]), np_books[s], rtol=1e-6, atol=1e-9
        )
    enc = {
        r.vec_id: list(r.codes)
        for r in pq_encode(emb, books, dim=DIM).collect()
    }
    got = np.array([enc[i] for i in ids])
    assert (got == np_codes).all()


@pytest.mark.slow
def test_pq_recall_floor(spark, corpus):
    """ADC top-10 must recover a solid fraction of the exact top-10
    (the testdata embeddings are label-clustered, so PQ with 16 codes
    per subspace separates them well)."""
    emb, ids, vecs = corpus
    q = vecs[0].astype(np.float64)
    books = pq_train(emb, dim=DIM, m=M, k=K, iterations=ITERS)
    enc = pq_encode(emb, books, dim=DIM)
    approx = [r.vec_id for r in pq_search(enc, books, list(q), k=10).collect()]
    exact_order = np.lexsort((ids, ((vecs - q) ** 2).sum(axis=1)))
    exact = set(ids[exact_order[:10]])
    recall = len(exact & set(approx)) / 10
    assert recall >= 0.5, f"recall@10 = {recall}"


@pytest.mark.slow
def test_ivfpq_recall_floor_and_determinism(spark, corpus):
    """IVF-PQ (coarse cells + residual PQ + per-cell ADC) must recover
    a solid fraction of the exact top-10 when probing 4 of 10 cells,
    and be run-to-run deterministic (driver-side probe selection +
    deterministic training)."""
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.pq import (
        ivfpq_search,
    )

    emb, ids, vecs = corpus
    q = vecs[0].astype(np.float64)
    run1 = [
        (r.vec_id, r.approx_dist)
        for r in ivfpq_search(
            emb, list(q), nprobe=4, k=10, m=M, n_codes=K, iterations=ITERS
        ).collect()
    ]
    run2 = [
        (r.vec_id, r.approx_dist)
        for r in ivfpq_search(
            emb, list(q), nprobe=4, k=10, m=M, n_codes=K, iterations=ITERS
        ).collect()
    ]
    assert run1 == run2
    exact_order = np.lexsort((ids, ((vecs - q) ** 2).sum(axis=1)))
    exact = set(ids[exact_order[:10]])
    recall = len(exact & {v for v, _ in run1}) / 10
    assert recall >= 0.5, f"recall@10 = {recall}"


@pytest.mark.slow
def test_pq_compression_beats_random(spark, corpus):
    """Reconstruction MSE from the trained codebooks must be far below
    the corpus variance (i.e. the codes carry real information)."""
    emb, ids, vecs = corpus
    books = pq_train(emb, dim=DIM, m=M, k=K, iterations=ITERS)
    enc = {r.vec_id: list(r.codes) for r in pq_encode(emb, books, dim=DIM).collect()}
    sub = DIM // M
    x = vecs.astype(np.float64)
    recon = np.zeros_like(x)
    for row, vid in enumerate(ids):
        for s in range(M):
            recon[row, s * sub : (s + 1) * sub] = books[s][enc[vid][s]]
    mse = ((x - recon) ** 2).mean()
    var = x.var()
    assert mse < 0.5 * var, f"mse={mse:.4f} var={var:.4f}"


@pytest.mark.slow
def test_pq_encode_broadcast_equals_literal(spark, corpus):
    """The GEMM encode path (assign_mode='broadcast') must emit exactly
    the literal path's codes at the same codebooks — and 'auto' must
    route above LITERAL_K_CEILING without changing the contract."""
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.kmeans import (
        LITERAL_K_CEILING,
    )

    emb, ids, vecs = corpus
    books = pq_train(emb, DIM, m=M, k=K, iterations=ITERS)
    lit = {
        r.vec_id: tuple(r.codes)
        for r in pq_encode(emb, books, DIM, assign_mode="literal").collect()
    }
    bc = {
        r.vec_id: tuple(r.codes)
        for r in pq_encode(emb, books, DIM, assign_mode="broadcast").collect()
    }
    assert bc == lit and len(lit) > 0

    # large-K codebooks (beyond the literal ceiling): auto routes to the
    # GEMM path and matches a brute-force numpy argmin
    big_k = LITERAL_K_CEILING + 8
    X = vecs.astype(np.float64)
    ids = list(ids)
    sub = DIM // M
    big_books = [
        X[:big_k, s * sub : (s + 1) * sub].astype(np.float64).tolist()
        for s in range(M)
    ]
    got = {
        r.vec_id: tuple(r.codes)
        for r in pq_encode(emb, big_books, DIM).collect()
    }
    want = {}
    for i, vid in enumerate(ids):
        codes = []
        for s in range(M):
            d = ((X[i, s * sub : (s + 1) * sub][None, :] - np.asarray(big_books[s])) ** 2).sum(axis=1)
            codes.append(int(d.argmin()))
        want[vid] = tuple(codes)
    assert got == want


def test_null_embedding_gets_null_codes_in_both_modes(spark):
    """A NULL vector must encode to NULL codes in BOTH paths: the
    broadcast UDF used to crash on np.asarray(None), and the literal
    fold used to emit [0]*M (its initial accumulator) — silently
    assigning junk codes. Flipping assign_mode must not change null
    handling."""
    df = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 1.0]), (2, None)],
        "vec_id long, embedding array<double>",
    )
    books = [
        [[1.0, 0.0], [0.0, 1.0]],
        [[0.0, 1.0], [1.0, 0.0]],
    ]
    lit = {
        r.vec_id: (tuple(r.codes) if r.codes is not None else None)
        for r in pq_encode(df, books, 4, assign_mode="literal").collect()
    }
    bc = {
        r.vec_id: (tuple(r.codes) if r.codes is not None else None)
        for r in pq_encode(df, books, 4, assign_mode="broadcast").collect()
    }
    assert lit == {1: (0, 0), 2: None}
    assert bc == lit


def test_ivfpq_refined_rerank_is_exact_on_shortlist(spark, corpus):
    """IVFADC+R (ivfpq_search_refined): the refined stage's exact_dist
    must equal brute-force squared-L2 for every returned id, the
    result must be ordered by it, and refined recall@10 vs exact
    search must be >= the unrefined ADC ordering's recall (refinement
    can only fix orderings inside the shortlist, never hurt them)."""
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.pq import (
        ivfpq_search,
        ivfpq_search_refined,
    )

    emb, ids, vecs = corpus
    X = vecs.astype(np.float64)
    ids = list(ids)
    q = X[0]
    exact_order = sorted(
        range(len(ids)), key=lambda i: (((X[i] - q) ** 2).sum(), ids[i])
    )
    exact_top = {ids[i] for i in exact_order[:10]}

    kwargs = dict(nprobe=4, k=10, m=M, n_codes=K, iterations=ITERS)
    plain = ivfpq_search(emb, [float(x) for x in q], **kwargs).collect()
    refined = ivfpq_search_refined(
        emb, [float(x) for x in q], shortlist_mult=4, **kwargs
    ).collect()

    by_id = {ids[i]: ((X[i] - q) ** 2).sum() for i in range(len(ids))}
    for r in refined:
        assert abs(r.exact_dist - by_id[r.vec_id]) < 1e-6
    dists = [r.exact_dist for r in refined]
    assert dists == sorted(dists)

    recall_plain = len({r.vec_id for r in plain} & exact_top) / 10
    recall_refined = len({r.vec_id for r in refined} & exact_top) / 10
    assert recall_refined >= recall_plain
    assert recall_refined >= 0.5, recall_refined


def test_ivfpq_short_vector_never_encoded_or_returned(spark):
    """r9 review: a wrong-length vector gets cell NULL (hygiene
    contract), but element_at(<literal centroids>, NULL) yields the
    LAST centroid on Spark 4.1 and zip_with would pad the residual to
    full length — sneaking garbage codes past pq_encode's size guard.
    The residual must be NULL for NULL cells so the row can neither
    train codebooks nor appear in search results."""
    from pyspark.sql import functions as F

    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.pq import (
        ivfpq_search,
    )

    rows = [
        (i, i % 3, [float(i % 5), float((i * 7) % 11), float(i % 3), 1.0])
        for i in range(24)
    ]
    df = spark.createDataFrame(
        [(i, v) for i, _, v in rows] + [(99, [1.0, 2.0])],
        "vec_id long, embedding array<double>",
    ).withColumn(
        "label", (F.col("vec_id") % 3).cast("int")
    )
    out = ivfpq_search(
        df, [1.0, 2.0, 1.0, 1.0], k=10, m=2, n_codes=4, nprobe=3
    ).collect()
    assert 99 not in {r.vec_id for r in out}
    assert len(out) > 0


def test_s20b_seeded_ivfadc_exact_on_shortlist_and_recall(spark, corpus):
    """s20b (the oracle-certified seeded IVFADC+R): exact_dist must
    equal brute-force squared-L2 for every returned id (rounded 6 dp,
    the catalog contract), ranks must follow it, every query returns
    exactly k rows, and recall@10 vs exact search clears a floor — the
    refinement contract on the sampled codebooks."""
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans import (
        get_spec,
    )

    _, ids, vecs = corpus
    X = vecs.astype(np.float64)
    ids = list(ids)
    out = get_spec("s20b_ivfadc_seeded").build(spark, SF).collect()

    by_id = {ids[i]: X[i] for i in range(len(ids))}
    got_q = {}
    for r in out:
        q = by_id[r.q_id]
        true = float(((by_id[r.vec_id] - q) ** 2).sum())
        assert abs(r.exact_dist - true) < 1e-6, (r, true)
        got_q.setdefault(r.q_id, []).append(r)

    recalls = []
    for q_id, rows in got_q.items():
        rows.sort(key=lambda r: r.rank)
        dists = [r.exact_dist for r in rows]
        assert dists == sorted(dists)
        assert len(rows) == 10
        q = by_id[q_id]
        exact_order = sorted(
            (i for i in range(len(ids)) if ids[i] % 50 != 0),
            key=lambda i: (float(((X[i] - q) ** 2).sum()), ids[i]),
        )
        exact_top = {ids[i] for i in exact_order[:10]}
        recalls.append(len({r.vec_id for r in rows} & exact_top) / 10)
    assert got_q, "no query returned rows"
    # Recall context: the testdata is near-isotropic (the st15/s05
    # finding — cluster radii ~85deg), so the true top-10 spreads
    # almost uniformly over the 8 cells and nprobe=2/8 alone caps
    # expected recall near 0.25 REGARDLESS of codebook quality;
    # measured mean is ~0.2. The floor is a regression canary, not a
    # quality claim — s20b's claim is the exactness certificate above
    # (and the oracle hash); quality-tuned recall lives in s20/s10's
    # Lloyd-trained pins.
    assert sum(recalls) / len(recalls) >= 0.15, recalls
