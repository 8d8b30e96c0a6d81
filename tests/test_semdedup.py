"""Semantics pins for the round-3 curation additions: SemDeDup
(operators/semdedup.py), the bounded per-key cap (operators/caps.py),
and the JL random projection (plans/llmops.py s12).

These are the non-SQL-expressible / sampling-flavored operators whose
catalog entries are rows-only or whose statistical behavior an oracle
hash cannot capture — so each gets a direct fixture or statistical pin
here, mirroring the strategy of tests/test_kmeans_skew.py and
tests/test_pq.py.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from conftest import SF_SMOKE


def test_semantic_dedup_collapses_known_groups(spark):
    """Two exact-duplicate groups + six distinct one-hots: exactly the
    lowest id of each dup group survives, every distinct row survives."""
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.semdedup import (
        semantic_dedup,
    )

    rows = []
    for i in (1, 2, 3):  # group A, identical
        rows.append((i, [1.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]))
    for i in (4, 5):  # group B, identical
        rows.append((i, [0.0, 0.0, 1.0, 1.0, 0.0, 0.0, 0.0, 0.0]))
    for j, i in enumerate(range(6, 12)):  # distinct one-hots (cos <= 1/sqrt(2))
        v = [0.0] * 8
        v[2 + j] = 1.0
        rows.append((i, v))
    em = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    out = semantic_dedup(em, k=4, iterations=2, threshold=0.99)
    survivors = {r["vec_id"] for r in out.collect()}
    assert survivors == {1, 4, 6, 7, 8, 9, 10, 11}


def test_semantic_dedup_threshold_one_keeps_all_distinct(spark):
    """Nothing is near-identical at threshold > 1 -> identity set."""
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.semdedup import (
        semantic_dedup,
    )

    em = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    out = semantic_dedup(em, k=8, iterations=1, threshold=1.01)
    assert out.count() == em.count()


def test_cap_per_key_matches_naive_window(spark):
    """cap_per_key == groupby-head under the same total order, including
    on a 90%-skewed key — and the plan must carry Catalyst's two-phase
    WindowGroupLimit with the Partial phase BELOW the hash exchange
    (the scale property: the shuffle forwards at most n rows per key
    per map task, never a hot key's full row count)."""
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.caps import (
        cap_per_key,
    )

    rows = [("hot", i, f"{(i * 2654435761) % 1000:04d}") for i in range(90)]
    rows += [(f"k{i % 3}", 1000 + i, f"{(i * 48271) % 1000:04d}") for i in range(10)]
    df = spark.createDataFrame(rows, "src string, id long, ord string").repartition(8)

    n = 7
    out = cap_per_key(df, key_col="src", order_col="ord", tiebreak_col="id", n=n)
    got = {(r["src"], r["id"], r["pick"]) for r in out.collect()}

    pdf = df.toPandas().sort_values(["src", "ord", "id"])
    pdf["pick"] = pdf.groupby("src").cumcount() + 1
    want = {
        (r.src, r.id, r.pick) for r in pdf[pdf["pick"] <= n].itertuples(index=False)
    }
    assert got == want

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" in plan
    above, below = plan.split("Exchange hashpartitioning", 1)
    assert "WindowGroupLimit" in above and "Final" in above
    assert "WindowGroupLimit" in below and "Partial" in below


def test_random_projection_is_unbiased_distance_estimator(spark):
    """JL property at the fixed md5 seed: E[||proj(a)-proj(b)||^2] =
    (d_proj/12) * ||a-b||^2 (planes ~ U[-0.5,0.5), var 1/12). With
    d_proj=8 a single pair is noisy, so pin the MEAN ratio over many
    pairs (within 15%) plus a positive rank association."""
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark import plans

    spec = plans.all_specs()["s12_random_projection"]
    long = spec.build(spark, SF_SMOKE).toPandas()
    proj = long.pivot(index="vec_id", columns="p", values="proj").sort_index()

    em = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").toPandas()
    em = em.set_index("vec_id").sort_index()
    V = np.stack([np.asarray(v, dtype=float) for v in em["embedding"]])
    P = proj.to_numpy()
    assert P.shape == (len(V), 8)

    rng = np.random.RandomState(0)
    idx = rng.choice(len(V), (400, 2))
    mask = idx[:, 0] != idx[:, 1]
    idx = idx[mask]
    d_orig = ((V[idx[:, 0]] - V[idx[:, 1]]) ** 2).sum(axis=1)
    d_proj = ((P[idx[:, 0]] - P[idx[:, 1]]) ** 2).sum(axis=1)

    ratio = (d_proj / d_orig).mean()
    expected = 8 / 12.0
    assert math.isclose(ratio, expected, rel_tol=0.15), (ratio, expected)
    assert np.corrcoef(d_orig, d_proj)[0, 1] > 0.05


def test_random_projection_no_shuffle(spark):
    """The projection is a pure scan+project: literal matrix, one fold
    per output dim, zero Exchange of any kind."""
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark import plans

    spec = plans.all_specs()["s12_random_projection"]
    df = spec.build(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
