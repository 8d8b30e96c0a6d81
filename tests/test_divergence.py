"""t25's Jensen-Shannon algebra (plans/curation.js_divergence_matrix —
the ONE copy the catalog entry also runs), pinned adversarially:

1. the inner-join + private-mass-identity formulation must equal the
   textbook full-support JS computed densely in numpy on seeded random
   corpora (including sources with partially disjoint vocabularies —
   the case the identity exists for);
2. JS's mathematical contract: JS(P, P) = 0, and 0 <= JS <= ln 2 with
   the ln 2 ceiling REACHED by fully disjoint sources (via the LEFT
   join against the pair frame, which the inner token join alone would
   silently drop)."""

from __future__ import annotations

import math

import numpy as np

from pyspark.sql import functions as F

from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans.curation import (
    js_divergence_matrix,
)


def _spark_js(spark, rows):
    """Run the production helper over an in-memory (source, token)
    stream of occurrences."""
    counts = (
        spark.createDataFrame(rows, "source string, token string")
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return {
        (r.source_a, r.source_b): r.js_divergence
        for r in js_divergence_matrix(counts).collect()
    }


def _dense_js(p, q):
    """Textbook full-support JS over aligned probability vectors."""
    m = (p + q) / 2.0
    kl = lambda x, y: float(
        sum(xi * math.log(xi / yi) for xi, yi in zip(x, y) if xi > 0)
    )
    return 0.5 * kl(p, m) + 0.5 * kl(q, m)


def test_js_identity_matches_dense_reference(spark):
    rng = np.random.RandomState(99)
    vocab = [f"w{i}" for i in range(30)]
    rows, dists = [], {}
    for s, lo, hi in [("sa", 0, 20), ("sb", 10, 30), ("sc", 5, 25)]:
        # overlapping but non-identical supports; random counts 1..9
        cnts = np.zeros(len(vocab), dtype=int)
        for i in range(lo, hi):
            cnts[i] = rng.randint(1, 10)
        dists[s] = cnts / cnts.sum()
        for i, c in enumerate(cnts):
            rows.extend([(s, vocab[i])] * int(c))
    got = _spark_js(spark, rows)
    assert set(got) == {("sa", "sb"), ("sa", "sc"), ("sb", "sc")}
    for (s1, s2), js in got.items():
        want = _dense_js(dists[s1], dists[s2])
        assert abs(js - want) < 1e-6, (s1, s2, js, want)
        assert 0.0 <= js <= math.log(2) + 1e-9


def test_js_disjoint_sources_hit_the_ln2_ceiling(spark):
    """Fully disjoint vocabularies: the inner token join yields NOTHING
    for the pair, so the answer rides entirely on the pair-frame LEFT
    join + private-mass identity — and must be exactly ln 2."""
    rows = [("da", "x1"), ("da", "x2"), ("db", "y1"), ("db", "y2"), ("db", "y3")]
    got = _spark_js(spark, rows)
    assert set(got) == {("da", "db")}
    assert abs(got[("da", "db")] - math.log(2)) < 1e-9


def test_js_identical_sources_are_zero(spark):
    rows = [("ia", "t1"), ("ia", "t1"), ("ia", "t2"),
            ("ib", "t1"), ("ib", "t1"), ("ib", "t2")]
    got = _spark_js(spark, rows)
    assert abs(got[("ia", "ib")]) < 1e-9
