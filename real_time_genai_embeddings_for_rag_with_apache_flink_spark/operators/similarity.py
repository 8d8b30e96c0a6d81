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


def label_centroids(corpus: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Coarse-quantizer cells from the corpus's label column: per-label
    dimension-wise mean, returned as (cell, centroid array<float>).
    Swap the label for a k-means assignment (operators/kmeans.py) when
    no labeling exists."""
    return (
        corpus.select("label", F.posexplode(vec_col).alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(F.avg(F.col("val").cast("double")).alias("cval"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "cval"))).alias("pairs"))
        .select(
            F.col("label").alias("cell"),
            F.transform(F.col("pairs"), lambda p: p.cval.cast("float")).alias(
                "centroid"
            ),
        )
    )


def ivf_search(
    corpus: DataFrame,
    queries: DataFrame,
    nprobe: int = 2,
    k: int = 5,
    query_id: str = "q_id",
    query_vec: str = "q_vec",
) -> DataFrame:
    """IVF-pruned ANN: nearest-centroid cell assignment for the corpus,
    nprobe-nearest cells per query, exact scoring only inside probed
    cells, per-query top-k.

    At scale the assignment is precomputed and the corpus is stored
    partitioned/bucketed by cell, so a query batch scans nprobe/K of the
    data; centroids and probe lists are broadcast. Recall scales with
    nprobe — on data with no cluster structure it approaches the honest
    lower bound nprobe/K (tests/test_ann_recall.py pins the tradeoff)."""
    cents_b = F.broadcast(label_centroids(corpus))
    w_assign = Window.partitionBy("vec_id").orderBy(F.desc("csim"), F.col("cell"))
    assigned = (
        corpus.crossJoin(cents_b)
        .select(
            "vec_id",
            "embedding",
            "cell",
            cosine_similarity(F.col("embedding"), F.col("centroid")).alias("csim"),
        )
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .drop("rn", "csim")
    )
    w_probe = Window.partitionBy(query_id).orderBy(F.desc("qsim"), F.col("cell"))
    probes = (
        queries.crossJoin(cents_b)
        .select(
            query_id,
            query_vec,
            "cell",
            cosine_similarity(F.col(query_vec), F.col("centroid")).alias("qsim"),
        )
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= nprobe)
        .select(query_id, query_vec, "cell")
    )
    w_rank = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.col("vec_id"))
    return (
        assigned.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col(query_id))
        .select(
            query_id,
            "vec_id",
            F.round(
                cosine_similarity(F.col("embedding"), F.col(query_vec)), 6
            ).alias("sim"),
        )
        .withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
    )
