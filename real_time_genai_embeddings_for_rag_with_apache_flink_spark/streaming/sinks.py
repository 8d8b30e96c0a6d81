"""Streaming sinks: foreachBatch bulk writers.

Reference sink: OpenSearch bulk indexer, flush interval 1 ms, SigV4
signed, emitter ``{passage_embedding, date, text}`` with auto-generated
doc ids (``KDS-P/.../msf/DataStreamJob.java:158-177,183-193``). Here the
engine-default sink is a parquet vector table (same at-least-once
guarantee via checkpointed micro-batches); dead-letter rows (embedding
errors, which the reference turns into sink-crashing nulls,
``BedRockEmbeddingModelAsyncCustomMessage.java:109-112``) are split into
a sibling table. An OpenSearch adapter keeps the same bulk-emitter shape
behind an import gate (opensearch-py is not in this container).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..operators.normalize import to_sink_docs


def foreach_batch_writer(cfg: PipelineConfig) -> Callable[[DataFrame, int], None]:
    """Build the foreachBatch function for the configured sink."""
    if cfg.sink_format == "parquet":
        if not cfg.sink_path:
            raise ValueError("parquet sink needs sink_path")
        return _parquet_writer(cfg)
    if cfg.sink_format == "memory":
        raise ValueError(
            "memory sink is handled by writeStream.format('memory'), not foreachBatch"
        )
    if cfg.sink_format == "opensearch":
        return _opensearch_writer(cfg)
    raise ValueError(f"unknown sink_format {cfg.sink_format!r}")


def _parquet_writer(cfg: PipelineConfig) -> Callable[[DataFrame, int], None]:
    sink_path, dead_path = cfg.sink_path, f"{cfg.sink_path}_dead_letter"
    has_error = cfg.on_error == "dead-letter"
    idempotent = bool(cfg.extra.get("idempotent_sink", False))

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        # Plain append -> at-least-once on replay (the reference's bulk
        # sink guarantee). With idempotent_sink, each micro-batch lands
        # in its own _batch=<id> partition via dynamic partition
        # overwrite: a replayed batch REPLACES its partition instead of
        # appending a second copy -> effectively exactly-once output.
        good = batch
        if has_error:
            bad = batch.filter(F.col("error").isNotNull())
            if not bad.isEmpty():
                bad.write.mode("append").parquet(dead_path)
            good = batch.filter(F.col("error").isNull())
        docs = to_sink_docs(good)
        if idempotent:
            spark = batch.sparkSession
            prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            try:
                (
                    docs.withColumn("_batch", F.lit(batch_id))
                    .write.partitionBy("_batch")
                    .mode("overwrite")
                    .parquet(sink_path)
                )
            finally:
                spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        else:
            docs.write.mode("append").parquet(sink_path)

    return write_batch


def _opensearch_writer(cfg: PipelineConfig) -> Callable[[DataFrame, int], None]:
    try:
        from opensearchpy import OpenSearch, helpers  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "opensearch sink requires opensearch-py (not in this container); "
            "use sink_format='parquet'"
        ) from e

    index = cfg.extra.get("index", "embeddings")
    hosts = cfg.extra.get("hosts", ["https://localhost:9200"])

    def write_batch(batch: DataFrame, batch_id: int) -> None:  # pragma: no cover
        client = OpenSearch(hosts=hosts)
        docs = to_sink_docs(batch.filter(F.col("error").isNull()))
        actions = (
            {
                "_index": index,
                "_source": {
                    "passage_embedding": row.passage_embedding,
                    "date": row.date.isoformat() if row.date else None,
                    "text": row.text,
                },
            }
            for row in docs.toLocalIterator()
        )
        helpers.bulk(client, actions)

    return write_batch
