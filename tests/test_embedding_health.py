"""s19 embedding-health diagnostics: the collapse case, pinned.

The Gram-identity shortcut (sum-of-unit-vectors norm instead of a
pairwise join) is only trustworthy if it reproduces the two analytic
extremes: a fully collapsed label (all vectors identical) must read
mean pairwise cosine exactly 1, and an orthogonal pair must read
exactly 0. Both are closed-form, so any drift here is an algebra bug,
not noise."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans import llmops


def _mkemb(spark, out, rows):
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet")
    )


def test_collapsed_and_orthogonal_labels_read_exactly(spark, tmp_path):
    out = str(tmp_path / "sf_health")
    v = [0.6, 0.8, 0.0, 0.0]
    rows = [(i, v, 0) for i in range(5)]  # label 0: collapsed
    rows += [  # label 1: two orthogonal unit vectors
        (10, [1.0, 0.0, 0.0, 0.0], 1),
        (11, [0.0, 1.0, 0.0, 0.0], 1),
    ]
    rows += [(20, [0.0] * 4, 2)]  # label 2: zero vector only -> dropped
    rows += [(30, [0.0, 0.0, 1.0, 0.0], 3)]  # label 3: ONE nonzero vector
    _mkemb(spark, out, rows)
    got = {
        r.label: r
        for r in llmops.s19_embedding_health(spark, out).collect()
    }
    assert got[0].n_vectors == 5
    assert got[0].mean_pairwise_cosine == 1.0  # collapse reads as 1
    assert got[0].avg_norm == 1.0
    assert got[0].centroid_norm == 1.0  # identical vectors: centroid = vector
    assert got[1].mean_pairwise_cosine == 0.0  # orthogonality reads as 0
    # the all-zero label is filtered before grouping: no row at all
    assert 2 not in got
    # a single-vector label has no pairs: n*(n-1) = 0 must read as NULL
    # (try_divide), not crash under ANSI mode and not emit NaN
    assert got[3].n_vectors == 1
    assert got[3].mean_pairwise_cosine is None
    assert got[3].centroid_norm == 1.0
