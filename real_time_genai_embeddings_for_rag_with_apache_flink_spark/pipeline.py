"""End-to-end embedding pipeline (batch form) + flagship query.

This is the reference's entire job (source -> parse -> normalize ->
filter -> embed -> vector sink; ``KDS-P/.../msf/DataStreamJob.java:133-177``)
re-expressed as one declarative DataFrame plan, plus the retrieval query
the reference delegates to OpenSearch: top-k nearest documents to a query
embedding. streaming/pipeline.py runs the identical stages as a
Structured Streaming job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.embed import DeterministicEmbedder, embed
from .operators.normalize import filter_nonempty_text, to_sink_docs
from .operators.similarity import topk_to_vector
from .sources.batch import load_table

DEFAULT_DIM = 64


def embed_documents(
    spark: SparkSession, sf_dir: str, dim: int = DEFAULT_DIM
) -> DataFrame:
    """documents table -> filtered -> embedded (EMB stage columns)."""
    docs = load_table(spark, sf_dir, "documents")
    docs = filter_nonempty_text(docs)
    return embed(docs, text_col="text", dim=dim, on_error="dead-letter")


def sink_documents(spark: SparkSession, sf_dir: str, dim: int = DEFAULT_DIM) -> DataFrame:
    """Vector-sink projection {passage_embedding, date, text} of the
    embedded documents (reference sink emitter DataStreamJob.java:185-187);
    doc timestamps are synthesized deterministically from doc_id."""
    emb = embed_documents(spark, sf_dir, dim)
    emb = emb.withColumn(
        "created_at",
        F.timestamp_seconds(F.lit(1704067200) + F.col("doc_id") * 60),
    )
    return to_sink_docs(emb)


def flagship_topk(
    spark: SparkSession,
    sf_dir: str,
    query_text: str = "spark table scan fast query",
    k: int = 10,
    dim: int = DEFAULT_DIM,
) -> DataFrame:
    """Flagship: embed the corpus, embed a query text with the same model,
    return the k most-similar documents (doc_id, sim)."""
    corpus = embed_documents(spark, sf_dir, dim).select("doc_id", "embedding")
    qvec = DeterministicEmbedder(dim).embed_batch([query_text])[0]
    return topk_to_vector(corpus, qvec, k=k, id_col="doc_id")


def flagship_topk_exact(
    spark: SparkSession,
    sf_dir: str,
    query_text: str = "spark table scan fast query",
    k: int = 10,
    dim: int = 32,
) -> DataFrame:
    """The SAME flagship dataflow (source -> filter -> embed -> top-k;
    ``KDS-P/.../msf/DataStreamJob.java:140-177``) on the engine-portable
    Md5BowEmbedder tower (the m06 convention: md5 buckets, exact integer
    weights, explicit ASCII-whitespace tokens), so every value the
    pipeline produces has an exact ANSI-SQL twin and the whole dataflow
    can be hash-certified against a second engine — the p02b driver row.
    Swapping the embedder is the ONLY difference from ``flagship_topk``;
    plan shape, stages, and the top-k cut are identical."""
    from .operators.embed import Md5BowEmbedder

    docs = filter_nonempty_text(load_table(spark, sf_dir, "documents"))
    corpus = (
        embed(
            docs,
            text_col="text",
            embedder_factory=Md5BowEmbedder,
            dim=dim,
            on_error="fail",
        )
        # whitespace-only texts embed to NULL (no tokens) — excluded on
        # both sides of the p02b oracle
        .filter(F.col("embedding").isNotNull())
        .select("doc_id", "embedding")
    )
    qvec = Md5BowEmbedder(dim).embed_batch([query_text])[0]
    return topk_to_vector(corpus, qvec, k=k, id_col="doc_id")
