"""PCA operator invariants (operators/pca.py, catalog s21).

PCA is rows-only in the driver gate (no SQL eigensolver), so THIS file
is its correctness pin: moments vs numpy on the collected corpus, basis
orthonormality, variance-equals-eigenvalue, determinism, the null
contract, and the optimality claim vs s12's random planes.
"""

from __future__ import annotations

import numpy as np
import pytest

from conftest import SF_SMOKE
from pyspark.sql.functions import col as F_col

DIM = 64
K = 8


@pytest.fixture(scope="module")
def corpus(spark):
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.sources.batch import (
        load_table,
    )

    df = load_table(spark, SF_SMOKE, "embeddings")
    X = np.array(
        [np.asarray(r.embedding, dtype=np.float64) for r in df.collect()]
    )
    return df, X


def test_moments_match_numpy(spark, corpus):
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.pca import (
        covariance_moments,
    )

    df, X = corpus
    n, mu, cov = covariance_moments(df, "embedding", DIM)
    assert n == len(X)
    np.testing.assert_allclose(mu, X.mean(axis=0), atol=1e-10)
    np.testing.assert_allclose(cov, np.cov(X.T, bias=True), atol=1e-8)


def test_basis_orthonormal_and_variance(spark, corpus):
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.pca import (
        pca_fit,
    )

    df, X = corpus
    W, vals, mu = pca_fit(df, "embedding", dim=DIM, k=K)
    assert W.shape == (DIM, K)
    np.testing.assert_allclose(W.T @ W, np.eye(K), atol=1e-10)
    # eigenvalues descending, non-negative (covariance is PSD)
    assert all(vals[i] >= vals[i + 1] - 1e-12 for i in range(K - 1))
    assert vals[-1] >= -1e-10
    # variance along component j equals eigenvalue j
    P = (X - mu[None, :]) @ W
    np.testing.assert_allclose(P.var(axis=0), vals, rtol=1e-8, atol=1e-12)
    # sign convention: largest-|coeff| entry positive
    for j in range(K):
        assert W[int(np.argmax(np.abs(W[:, j]))), j] > 0


def test_fit_deterministic(spark, corpus):
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.pca import (
        pca_fit,
    )

    df, _ = corpus
    W1, v1, m1 = pca_fit(df, "embedding", dim=DIM, k=K)
    W2, v2, m2 = pca_fit(df, "embedding", dim=DIM, k=K)
    assert np.array_equal(W1, W2) and np.array_equal(v1, v2)
    assert np.array_equal(m1, m2)


def test_projection_matches_numpy_and_null_contract(spark, corpus):
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.pca import (
        pca_fit,
        pca_project_broadcast,
    )

    df, X = corpus
    W, _, mu = pca_fit(df, "embedding", dim=DIM, k=K)
    rows = pca_project_broadcast(df, W, mu, "embedding").orderBy("vec_id").collect()
    got = np.array([r.proj for r in rows])
    want = np.array(
        [(np.asarray(r.embedding, np.float64) - mu) @ W for r in rows]
    )
    np.testing.assert_allclose(got, want, atol=1e-10)

    null_df = spark.createDataFrame(
        [(1, [0.0] * DIM), (2, None), (3, [1.0] * 3)],
        "vec_id long, embedding array<double>",
    )
    out = {
        r.vec_id: r.proj
        for r in pca_project_broadcast(null_df, W, mu, "embedding").collect()
    }
    assert out[2] is None and out[3] is None and out[1] is not None


def test_pca_beats_random_planes(spark, corpus):
    """Top-k PCA maximizes captured variance over ALL orthonormal
    k-bases, so it must capture at least as much as s12's hyperplane
    family (orthonormalized). Deterministic: both bases are fixed."""
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.pca import (
        pca_fit,
    )
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans.llmops import (
        _hyperplane,
    )

    df, X = corpus
    W, vals, mu = pca_fit(df, "embedding", dim=DIM, k=K)
    Xc = X - X.mean(axis=0)
    R = np.array([_hyperplane(p, DIM) for p in range(K)]).T  # dim x k
    Q, _ = np.linalg.qr(R)
    captured_pca = ((Xc @ W) ** 2).sum() / len(X)
    captured_rand = ((Xc @ Q) ** 2).sum() / len(X)
    assert captured_pca >= captured_rand
    np.testing.assert_allclose(captured_pca, vals.sum(), rtol=1e-8)


def test_catalog_entry_long_form(spark):
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans import (
        get_spec,
    )

    out = get_spec("s21_pca_projection").build(spark, SF_SMOKE)
    rows = out.limit(200).collect()
    assert {r.p for r in rows} <= set(range(K))
    assert out.columns == ["vec_id", "p", "proj"]


def test_s22_recall_floor_and_beats_jl_coarse(spark, corpus):
    """s22's honest-recall contract: on the near-isotropic testdata the
    8-d coarse pass keeps >= 40% of the true top-5 inside a 40-wide
    shortlist — and the SAME shortlist built from s12's JL planes keeps
    far less (the variance-optimal basis is the point of s21). Both
    bases are deterministic, so these are fixed numbers, not flaky
    statistics."""
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.pca import (
        pca_fit,
    )
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans import (
        get_spec,
    )
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans.llmops import (
        _hyperplane,
    )
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.sources.batch import (
        load_table,
    )

    df, _ = corpus
    em = {
        r.vec_id: np.asarray(r.embedding, np.float64)
        for r in load_table(spark, SF_SMOKE, "embeddings").collect()
    }
    qs = sorted(i for i in em if i % 50 == 0)
    cs = sorted(i for i in em if i % 50 != 0)
    X = np.array([em[i] for i in cs])
    corpus_df = df.filter("vec_id % 50 != 0")
    W, _, mu = pca_fit(corpus_df, "embedding", dim=DIM, k=K)

    def true_top5(q):
        qv = em[q]
        nrm = np.linalg.norm(X, axis=1) * np.linalg.norm(qv)
        sims = np.round((X @ qv) / nrm, 6)
        order = sorted(range(len(cs)), key=lambda j: (-sims[j], cs[j]))
        return {cs[j] for j in order[:5]}

    def coarse_recall(basis, center):
        P = (X - center) @ basis
        recs = []
        for q in qs:
            qp = (em[q] - center) @ basis
            d2 = ((P - qp) ** 2).sum(axis=1)
            short = {cs[j] for j in np.argsort(d2)[:40]}
            recs.append(len(true_top5(q) & short) / 5)
        return sum(recs) / len(recs)

    r_pca = coarse_recall(W, mu)
    R = np.array([_hyperplane(p, DIM) for p in range(K)]).T
    r_jl = coarse_recall(R, np.zeros(DIM))
    assert r_pca >= 0.4, r_pca
    assert r_pca > r_jl + 0.1, (r_pca, r_jl)

    # the catalog entry end-to-end: its shortlist is the PCA coarse
    # pass, so its final recall@5 equals the coarse containment rate
    got = get_spec("s22_pca_ann").build(spark, SF_SMOKE).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.q_id, set()).add(r.vec_id)
    e2e = sum(len(by_q.get(q, set()) & true_top5(q)) / 5 for q in qs) / len(qs)
    assert e2e == pytest.approx(r_pca, abs=1e-9)
    # determinism: a second run returns the identical rows
    again = get_spec("s22_pca_ann").build(spark, SF_SMOKE).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_s21_s22_null_embedding_contracts(spark, tmp_path):
    """Review regression pins: (1) s21 emits 8 (p, NULL) rows for a
    NULL/wrong-length embedding — the s12 long-form contract — instead
    of silently dropping the entity; (2) s22's coarse shortlist never
    contains a bad vector (NULL d2 would otherwise rank FIRST under
    NULLS FIRST ascending order and poison every query's shortlist)."""
    import random

    rng = random.Random(7)
    rows = []
    for i in range(61):
        if i == 7:
            rows.append((i, None))
        elif i == 9:
            rows.append((i, [1.0, 2.0]))  # wrong length
        else:
            rows.append((i, [rng.uniform(-1, 1) for _ in range(DIM)]))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).withColumn("label", (F_col("vec_id") % 3).cast("int")).coalesce(
        1
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")

    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans import (
        get_spec,
    )

    s21 = get_spec("s21_pca_projection").build(spark, str(tmp_path)).collect()
    by_vec = {}
    for r in s21:
        by_vec.setdefault(r.vec_id, []).append(r)
    assert len(by_vec[7]) == K and all(r.proj is None for r in by_vec[7])
    assert len(by_vec[9]) == K and all(r.proj is None for r in by_vec[9])
    assert len(by_vec[1]) == K and all(r.proj is not None for r in by_vec[1])

    s22 = get_spec("s22_pca_ann").build(spark, str(tmp_path)).collect()
    assert len(s22) > 0
    bad = {7, 9}
    assert not bad & {r.vec_id for r in s22}
    # query 50 is a real vector; its 5 answers are all good ids
    assert len([r for r in s22 if r.q_id == 50]) == 5
