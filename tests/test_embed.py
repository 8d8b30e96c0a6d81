"""Embedding operator unit tests (SURVEY.md §5 property tests).

Covers the semantics the reference leaves implicit or broken: the
empty-text filter (DataStreamJob.java:146 throws on missing keys), the
error policy (BedRockEmbeddingModelAsyncCustomMessage.java:109-112 emits
null, which would NPE its own sink), and embedding-dimension invariance
(index-creation-function/lambda_function.py:58-61).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.embed import (
    DeterministicEmbedder,
    embed,
)


def _exploding_embedder():
    # Defined inside a function so cloudpickle ships it by value (a
    # module-level class in a test file isn't importable on workers).
    class ExplodingEmbedder:
        def __init__(self, dim: int = 8):
            self.dim = dim

        def embed_batch(self, texts):
            raise RuntimeError("backend down")

    return ExplodingEmbedder


def test_deterministic_and_normalized():
    e = DeterministicEmbedder(dim=32)
    a1 = e.embed_batch(["hello world"])[0]
    a2 = DeterministicEmbedder(dim=32).embed_batch(["hello world"])[0]
    assert a1 == a2
    assert abs(math.sqrt(sum(x * x for x in a1)) - 1.0) < 1e-5


@pytest.mark.parametrize("dim", [64, 1024, 1536])
def test_dim_invariance(dim):
    e = DeterministicEmbedder(dim=dim)
    vec = e.embed_batch(["some text"])[0]
    assert len(vec) == dim


def test_embed_dataframe_schema(spark):
    df = spark.createDataFrame([("a b c",), ("d e",)], ["text"])
    out = embed(df, dim=16)
    rows = out.collect()
    assert out.schema["embedding"].dataType.simpleString() == "array<float>"
    assert all(len(r.embedding) == 16 for r in rows)
    assert all(r.error is None for r in rows)


def test_embed_null_text_dead_letters(spark):
    df = spark.createDataFrame([("x",), (None,)], "text string")
    rows = embed(df, dim=8).collect()
    by_text = {r.text: r for r in rows}
    assert by_text["x"].embedding is not None
    assert by_text[None].embedding is None


def test_on_error_drop(spark):
    df = spark.createDataFrame([("x",)], ["text"])
    out = embed(df, embedder_factory=_exploding_embedder(), dim=8, on_error="drop")
    assert out.count() == 0
    assert "error" not in out.columns


def test_on_error_dead_letter(spark):
    df = spark.createDataFrame([("x",)], ["text"])
    rows = embed(
        df, embedder_factory=_exploding_embedder(), dim=8, on_error="dead-letter"
    ).collect()
    assert rows[0].embedding is None
    assert "RuntimeError" in rows[0].error


def test_on_error_fail_raises(spark):
    df = spark.createDataFrame([("x",)], ["text"])
    out = embed(df, embedder_factory=_exploding_embedder(), dim=8, on_error="fail")
    with pytest.raises(Exception, match="backend down"):
        out.collect()


def test_on_error_unknown_policy(spark):
    df = spark.createDataFrame([("x",)], ["text"])
    with pytest.raises(ValueError, match="unknown on_error"):
        embed(df, dim=8, on_error="bogus")


def test_embed_distinct_matches_plain_embed(spark):
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.embed import (
        embed_distinct,
    )

    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other"), (4, "Same   TEXT")],
        ["id", "text"],
    )
    plain = {r.id: r.embedding for r in embed(df, dim=16).collect()}
    deduped = {r.id: r.embedding for r in embed_distinct(df, dim=16).collect()}
    assert set(plain) == set(deduped) == {1, 2, 3, 4}
    # rows 1/2/4 normalize to the same fingerprint -> identical vectors
    assert deduped[1] == deduped[2] == deduped[4]
    for i in plain:
        assert plain[i] == deduped[i]


def test_embed_distinct_drop_policy(spark):
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.embed import (
        embed_distinct,
    )

    df = spark.createDataFrame([(1, "x"), (2, "x")], ["id", "text"])
    out = embed_distinct(
        df, embedder_factory=_exploding_embedder(), dim=8, on_error="drop"
    )
    assert out.count() == 0
