"""ANN quality gate for the IVF path.

The synthetic embeddings have essentially no cluster structure (labels
are near-random in cosine space), so this pins the honest IVF contract
rather than a flattering number: candidates are pruned to ~nprobe/K of
the corpus, recall@5 rises monotonically with nprobe, and at
nprobe=K (no pruning) the search is exact."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMOKE

from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.similarity import (
    ivf_search,
    knn_join,
)
from real_time_genai_embeddings_for_rag_with_apache_flink_spark.sources.batch import (
    load_table,
)


def _truth(spark, em, queries, k=5):
    exact = knn_join(queries, em, k=k + 1)
    ordered: dict[int, list[int]] = {}
    for r in sorted(exact.collect(), key=lambda r: (r.q_id, r.rank)):
        if r.vec_id != r.q_id:
            ordered.setdefault(r.q_id, []).append(r.vec_id)
    return {q: set(v[:k]) for q, v in ordered.items()}


def _recall(got_df, truth):
    got: dict[int, set[int]] = {}
    for r in got_df.collect():
        got.setdefault(r.q_id, set()).add(r.vec_id)
    per_q = [
        len(truth[q] & got.get(q, set())) / len(truth[q]) for q in truth
    ]
    return sum(per_q) / len(per_q)


@pytest.mark.slow
def test_ivf_recall_tradeoff_and_pruning(spark):
    em = load_table(spark, SF_SMOKE, "embeddings")
    queries = em.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    truth = _truth(spark, em, queries)
    n_cells = em.select("label").distinct().count()

    r2 = _recall(ivf_search(em, queries, nprobe=2), truth)
    r_all = _recall(ivf_search(em, queries, nprobe=n_cells), truth)

    # no pruning -> exact
    assert r_all == 1.0, f"nprobe=K must be exact, got {r_all:.2f}"
    # pruned search still finds a nontrivial share on unclustered data
    # (>= the nprobe/K floor, with slack for tiny-sample variance)
    assert r2 >= 0.15, f"recall@5 at nprobe=2 collapsed: {r2:.2f}"
    assert r_all >= r2

    # pruning factor: candidates scored at nprobe=2 are ~2/K of corpus
    scored = ivf_search(em, queries, nprobe=2, k=10**9)
    per_query = scored.groupBy("q_id").count().collect()
    corpus_n = em.count()
    for row in per_query:
        assert row["count"] < 0.5 * corpus_n, (
            f"query {row.q_id} scored {row['count']}/{corpus_n} — not pruned"
        )
