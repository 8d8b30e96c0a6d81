"""d27 prefix-filter set-similarity join: exactness pinned adversarially.

The prefix-filtering lemma guarantees zero false negatives only if the
prefix length, the global token order, and the length filter are all
implemented correctly — each has a classic off-by-one failure mode
(prefix one token short, order not total, strict instead of non-strict
length bound) that silently drops pairs near the threshold. This file
compares the pruned plan against brute force on a fixture built to sit
ON those edges: pairs exactly at Jaccard = tau, just below, sets at the
length-filter boundary, and a hub token shared by every document (the
case that would explode a naive inverted-index join and that prefix
ordering must keep out of the candidate set).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans import (
    llmops,
    pipeline_extra,
)

TAU = pipeline_extra._PREFIX_TAU


def _mkdocs(spark, out, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    (
        df.withColumn("lang", F.lit("en"))
        .withColumn("source", F.lit("fixture"))
        .withColumn("n_chars", F.length("text"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(out, "documents.parquet"))
    )


def _brute_force(spark, sf_dir):
    sh = llmops._shingled_df(spark, sf_dir).filter(F.size("grams") > 0)
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("grams").alias("ga"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("grams").alias("gb"))
    inter = F.size(F.array_intersect("ga", "gb"))
    union = F.size(F.array_union("ga", "gb"))
    jacc = F.round(inter.cast("double") / union, 6)
    return {
        (r.id_a, r.id_b, r.jaccard)
        for r in a.join(b, F.col("id_b") > F.col("id_a"))
        .select("id_a", "id_b", jacc.alias("jaccard"))
        .filter(F.col("jaccard") >= TAU)
        .collect()
    }


@pytest.fixture(scope="module")
def edge_sf_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("prefix_join") / "sf_edge")
    # Every doc shares the hub phrase "common stop words" (a maximal-df
    # shingle); pair structure is driven by the distinctive tails.
    hub = "common stop words"
    base = "alpha beta gamma delta epsilon zeta eta theta"
    texts = [
        # 0 and 1: identical -> J = 1.0
        f"{hub} {base} one two three",
        f"{hub} {base} one two three",
        # 2: shares most of 0's shingles -> J comfortably above tau
        f"{hub} {base} one two four",
        # 3: overlaps 0 just below tau (longer distinct tail)
        f"{hub} {base} nine ten eleven twelve thirteen fourteen",
        # 4: hub only -> far below tau with everyone
        f"{hub} totally different content here entirely",
        # 5: too short for any trigram (dropped by the shingler)
        "tiny doc",
        # 6 and 7: a pair exactly AT the boundary by construction below
        "p q r s t u",  # grams: "p q r","q r s","r s t","s t u" (4)
        "p q r s v w",  # grams: "p q r","q r s","r s v","s v w" (4)
        # intersection 2, union 6 -> J = 0.333 (below tau; must NOT appear)
        # 8 and 9: J exactly 0.5: A=6 grams, B=6 grams, inter 4, union 8
        "a1 a2 a3 a4 a5 a6 a7 a8",  # 6 grams
        "a1 a2 a3 a4 a5 a6 b7 b8",  # 6 grams; shares first 4 -> 4/8 = 0.5
    ]
    _mkdocs(spark, out, texts)
    llmops.clear_intermediate_cache()
    yield out
    llmops.clear_intermediate_cache()


def test_prefix_join_equals_brute_force_on_edge_fixture(spark, edge_sf_dir):
    got = {
        (r.id_a, r.id_b, r.jaccard)
        for r in pipeline_extra.d27_prefix_filter_join(
            spark, edge_sf_dir
        ).collect()
    }
    want = _brute_force(spark, edge_sf_dir)
    assert got == want
    # The fixture must actually exercise the edges it claims.
    assert (0, 1, 1.0) in want  # identical pair
    assert (8, 9, 0.5) in want  # pair exactly AT tau
    assert not any({a, b} == {6, 7} for a, b, _ in want)  # below tau


def test_threshold_pair_survives_exactly_at_tau(spark, edge_sf_dir):
    """The J = 0.5 pair is the lemma's worst case: prefix length
    n - ceil(tau*n) + 1 = 6 - 3 + 1 = 4, and the four shared shingles
    must intersect both 4-long prefixes under the df order. One token
    shorter and this pair vanishes."""
    rows = pipeline_extra.d27_prefix_filter_join(spark, edge_sf_dir).collect()
    at_tau = [r for r in rows if {r.id_a, r.id_b} == {8, 9}]
    assert len(at_tau) == 1
    assert at_tau[0].jaccard == 0.5


def test_prefix_join_equals_brute_force_on_randomized_corpus(
    spark, tmp_path_factory
):
    """Seeded randomized cross-validation: 40 documents assembled from a
    30-token vocabulary with heavy overlap (shared prefixes, shuffled
    tails, duplicated halves) generate hundreds of pairs scattered
    across the whole Jaccard range — far more threshold-adjacent and
    tie-shaped pairs than any handcrafted fixture. The pruned plan must
    agree with brute force on EVERY pair; one missed pair here means a
    lemma off-by-one that the driver's 500-doc corpus may never
    surface."""
    import random

    rng = random.Random(20260814)
    vocab = [f"w{i}" for i in range(30)]
    # Mutation-based generation: trigram shingles are SEQUENCES, so
    # fully random token streams almost never overlap — near-dup pairs
    # come from documents that share runs. Five base documents, each
    # cloned with 0-3 point mutations / truncations / appends, yield
    # dozens of pairs clustered around the threshold.
    bases = [
        [rng.choice(vocab) for _ in range(rng.randint(8, 14))]
        for _ in range(5)
    ]
    texts = []
    for _ in range(40):
        toks = list(rng.choice(bases))
        for _ in range(rng.randint(0, 3)):
            op = rng.random()
            if op < 0.4 and len(toks) > 4:
                toks[rng.randrange(len(toks))] = rng.choice(vocab)
            elif op < 0.7 and len(toks) > 5:
                del toks[rng.randrange(len(toks))]
            else:
                toks.append(rng.choice(vocab))
        texts.append(" ".join(toks))
    out = str(tmp_path_factory.mktemp("prefix_rand") / "sf_rand")
    _mkdocs(spark, out, texts)
    llmops.clear_intermediate_cache()
    try:
        got = {
            (r.id_a, r.id_b, r.jaccard)
            for r in pipeline_extra.d27_prefix_filter_join(
                spark, out
            ).collect()
        }
        want = _brute_force(spark, out)
    finally:
        llmops.clear_intermediate_cache()
    assert got == want
    # the corpus must be adversarial enough to mean something
    assert len(want) >= 20
