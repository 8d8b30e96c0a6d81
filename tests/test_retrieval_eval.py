"""s25 retrieval-quality eval: hand-computed metrics on a constructed
corpus (hit at rank 1, hit at rank 2, no hit / unseen label), plus the
scale pin — the eval's top-k pass must keep the two-phase
WindowGroupLimit shape (shuffle bounded by |Q|*k) with zero Python."""

from __future__ import annotations

from conftest import SF_SMOKE
from pyspark.sql import functions as F

from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.similarity import (
    ndcg_weights,
    retrieval_eval,
)

W = ndcg_weights(2)  # [1000000, 630930]
IDCG2 = W[0] + W[1]


def _frames(spark):
    queries = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0),  # first hit at rank 1
            (2, [0.0, 1.0], 1),  # first hit at rank 2
            (3, [1.0, 1.0], 5),  # label absent from the corpus
        ],
        "q_id long, q_vec array<float>, q_label int",
    )
    corpus = spark.createDataFrame(
        [
            (10, [1.0, 0.01], 0),  # q1's rank 1, relevant
            (11, [0.9, 0.1], 1),  # q1's rank 2, not relevant to q1
            (12, [0.05, 1.0], 0),  # q2's rank 1, not relevant to q2
            (13, [0.1, 0.9], 1),  # q2's rank 2, relevant
        ],
        "vec_id long, embedding array<float>, label int",
    )
    return queries, corpus


def test_retrieval_eval_hand_computed(spark):
    queries, corpus = _frames(spark)
    out = {
        r["q_id"]: r
        for r in retrieval_eval(queries, corpus, k=2).collect()
    }
    assert set(out) == {1, 2, 3}

    r1 = out[1]  # relevant item first: perfect MRR, DCG = w[0]
    assert (r1["n_rel"], r1["hits_at_k"]) == (2, 1)
    assert r1["recall_at_k"] == 0.5
    assert r1["mrr"] == 1.0
    assert r1["ndcg_at_k"] == round(W[0] / IDCG2, 6)

    r2 = out[2]  # relevant item second: MRR 1/2, DCG = w[1]
    assert (r2["n_rel"], r2["hits_at_k"]) == (2, 1)
    assert r2["recall_at_k"] == 0.5
    assert r2["mrr"] == 0.5
    assert r2["ndcg_at_k"] == round(W[1] / IDCG2, 6)

    r3 = out[3]  # no relevant items exist: all metrics pinned to 0
    assert (r3["n_rel"], r3["hits_at_k"]) == (0, 0)
    assert (r3["recall_at_k"], r3["mrr"], r3["ndcg_at_k"]) == (0.0, 0.0, 0.0)


def test_recall_caps_ideal_at_k(spark):
    """recall@k divides by min(n_rel, k): with 2 relevant in the corpus
    and k=1, retrieving the single best relevant item is recall 1.0."""
    queries, corpus = _frames(spark)
    out = {
        r["q_id"]: r
        for r in retrieval_eval(queries, corpus, k=1).collect()
    }
    assert out[1]["hits_at_k"] == 1
    assert out[1]["recall_at_k"] == 1.0  # 1 / min(2, 1)
    assert out[2]["hits_at_k"] == 0  # q2's rank-1 item is not relevant
    assert out[2]["mrr"] == 0.0


def test_s25_plan_bounds_preshuffle_rows(spark):
    """The eval's ranking pass must inherit knn_join's scale shape:
    Partial WindowGroupLimit below the hash exchange (<= k rows per
    query per map task reach the shuffle) and no Python crossing."""
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark import plans

    df = plans.get_spec("s25_retrieval_eval").build(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "EvalPython" not in plan
    assert "Exchange hashpartitioning" in plan
    above, below = plan.split("Exchange hashpartitioning", 1)
    assert "WindowGroupLimit" in above and "Final" in above
    assert "WindowGroupLimit" in below and "Partial" in below
    # both small sides of the metric joins stay broadcast
    assert plan.count("BroadcastExchange") >= 2


def test_metrics_bounded_on_real_data(spark):
    rows = (
        plans_build(spark)
        .select("recall_at_k", "mrr", "ndcg_at_k")
        .collect()
    )
    assert rows
    for r in rows:
        for m in ("recall_at_k", "mrr", "ndcg_at_k"):
            assert 0.0 <= r[m] <= 1.0


def plans_build(spark):
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark import plans

    return plans.get_spec("s25_retrieval_eval").build(spark, SF_SMOKE)
