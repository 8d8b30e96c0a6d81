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
    if cfg.sink_format == "delta":
        if not cfg.sink_path:
            raise ValueError("delta sink needs sink_path")
        keys = tuple(cfg.extra.get("upsert_keys", ()))
        if not keys:
            raise ValueError("delta sink needs extra['upsert_keys']")
        return delta_upsert_writer(
            cfg.sink_path,
            keys,
            order_by=tuple(cfg.extra.get("upsert_order_by", ())),
            table_factory=cfg.extra.get(
                "delta_table_factory", _default_delta_factory
            ),
        )
    raise ValueError(f"unknown sink_format {cfg.sink_format!r}")


def _parquet_writer(cfg: PipelineConfig) -> Callable[[DataFrame, int], None]:
    sink_path, dead_path = cfg.sink_path, f"{cfg.sink_path}_dead_letter"
    has_error = cfg.on_error == "dead-letter"
    idempotent = bool(cfg.extra.get("idempotent_sink", False))

    def _write_idempotent(df: DataFrame, path: str, batch_id: int) -> None:
        # Each micro-batch lands in its own _batch=<id> partition via
        # dynamic partition overwrite: a replayed batch REPLACES its
        # partition instead of appending a second copy -> effectively
        # exactly-once output.
        spark = df.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                df.withColumn("_batch", F.lit(batch_id))
                .write.partitionBy("_batch")
                .mode("overwrite")
                .parquet(path)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        # Plain append -> at-least-once on replay (the reference's bulk
        # sink guarantee); idempotent_sink upgrades BOTH the main table
        # and the dead-letter table to per-batch partition overwrite so
        # a replayed micro-batch can't duplicate either output.
        #
        # Dead-letter mode runs MULTIPLE actions over this batch (the
        # bad-row probe, the dead-letter write, the main write). Without
        # a persist each action re-evaluates the whole upstream plan —
        # i.e. the embedding UDF, the expensive stage the pipeline
        # exists to run, executes ~twice per micro-batch — and every
        # observed-metrics counter double-fires. Persist once; all
        # actions read the materialized batch.
        multi_action = has_error
        if multi_action:
            batch = batch.persist()
        try:
            good = batch
            if has_error:
                bad = batch.filter(F.col("error").isNotNull())
                if not bad.isEmpty():
                    if idempotent:
                        _write_idempotent(bad, dead_path, batch_id)
                    else:
                        bad.write.mode("append").parquet(dead_path)
                good = batch.filter(F.col("error").isNull())
            docs = to_sink_docs(good)
            if idempotent:
                _write_idempotent(docs, sink_path, batch_id)
            else:
                docs.write.mode("append").parquet(sink_path)
        finally:
            if multi_action:
                batch.unpersist()

    return write_batch


def _default_opensearch_factory(hosts, region, service):
    """Picklable factory: built on the driver, CALLED on each executor
    partition. Returns (client, bulk_fn). With a region configured the
    connection is SigV4-signed for service 'es' (managed domain) or
    'aoss' (serverless) — the exact signer split between the reference
    variants (KDS-P/.../msf/DataStreamJob.java:162 vs
    KDS-S/.../msf/DataStreamJob.java:185)."""

    def make():  # pragma: no cover - needs opensearch-py + a cluster
        from opensearchpy import OpenSearch, helpers

        kwargs: dict = {"hosts": hosts}
        if region:
            import boto3
            from opensearchpy import AWSV4SignerAuth, RequestsHttpConnection

            creds = boto3.Session().get_credentials()
            kwargs.update(
                http_auth=AWSV4SignerAuth(creds, region, service),
                connection_class=RequestsHttpConnection,
                use_ssl=True,
                verify_certs=True,
            )
        return OpenSearch(**kwargs), helpers.bulk

    return make


def knn_index_body(
    dimension: int,
    *,
    ef_construction: int = 128,
    m: int = 24,
    shards: int = 5,
    replicas: int = 1,
    space_type: str = "l2",
    engine: str = "nmslib",
) -> dict:
    """The k-NN index mapping the reference bootstraps before the job
    starts (index-creation-function/lambda_function.py:66-97): a
    knn_vector passage_embedding with hnsw(ef_construction=128, m=24),
    date + text fields, knn enabled, 5 shards. Dimension follows the
    embedding model (titan-v1 -> 1536, titan-v2 -> 1024,
    lambda_function.py:58-61 / PipelineConfig.resolved_dim)."""
    return {
        "mappings": {
            "properties": {
                "passage_embedding": {
                    "type": "knn_vector",
                    "dimension": dimension,
                    "method": {
                        "name": "hnsw",
                        "space_type": space_type,
                        "engine": engine,
                        "parameters": {"ef_construction": ef_construction, "m": m},
                    },
                },
                "date": {"type": "date"},
                # the reference maps text as a bare text field
                # (lambda_function.py:84); a keyword subfield is added
                # here because real OpenSearch disables fielddata on
                # text fields — sort/search_after (the paginated
                # read-back path, opensearch_http.search_all) must
                # target text.raw, and a bare text mapping would reject
                # it on a real domain even though full-text search
                # behavior is unchanged by the multi-field
                "text": {
                    "type": "text",
                    "fields": {"raw": {"type": "keyword"}},
                },
            }
        },
        "settings": {
            "index": {
                "knn": True,
                "number_of_shards": shards,
                "number_of_replicas": replicas,
            }
        },
    }


def ensure_knn_index(client, index: str, dimension: int, **knobs) -> bool:
    """Create the k-NN index if it does not exist yet. Returns True when
    this call created it. Without this bootstrap a fresh domain would
    auto-create a mapping-less index on first bulk write and store the
    vectors as plain floats — wrong (non-k-NN) storage that only fails
    at query time."""
    if client.indices.exists(index=index):
        return False
    resp = client.indices.create(index=index, body=knn_index_body(dimension, **knobs))
    if not resp.get("acknowledged", False):
        raise RuntimeError(f"index creation for {index!r} not acknowledged: {resp}")
    return True


def _opensearch_writer(cfg: PipelineConfig) -> Callable[[DataFrame, int], None]:
    """Executor-distributed bulk indexer: one client + one bulk stream
    per output partition (the reference's bulk-processor-per-subtask
    shape, DataStreamJob.java:158-177). The batch is NEVER funneled
    through the driver — a driver-side toLocalIterator loop caps
    throughput at one machine regardless of cluster size.

    cfg.extra knobs: index, hosts, aws_region + aws_service ('es'|'aoss')
    for SigV4, client_factory (injectable, mainly for tests),
    bootstrap_index (default True: create the k-NN index with the
    reference's hnsw mapping if missing, once, driver-side, before the
    first bulk write), knn_* overrides (knn_ef_construction, knn_m,
    knn_shards, knn_replicas, knn_space_type, knn_engine), and
    index_by_id (default False = the reference's deployed behavior:
    auto-generated document ids — its ``.id(element.get("_id"))`` line
    is commented out, DataStreamJob.java:191, so an at-least-once bulk
    retry can duplicate documents there. True routes the pipeline's M2
    ``_id`` onto each bulk action, turning every index into an
    idempotent upsert: a replay of the SAME body after a partial
    application converges instead of duplicating — pair with
    extra.id_strategy='deterministic' so restarts reuse ids; driver row
    st35 certifies the claim hash-exactly under injected partial-bulk
    faults)."""
    index = cfg.extra.get("index", "embeddings")
    hosts = cfg.extra.get("hosts", ["https://localhost:9200"])
    region = cfg.extra.get("aws_region")
    service = cfg.extra.get("aws_service", "es")
    factory = cfg.extra.get("client_factory")
    if factory is None and cfg.extra.get("transport") == "http":
        # the engine's own REST transport (streaming/opensearch_http.py)
        # — zero third-party deps, same partition code, SigV4 when
        # credentialed; this is the path that executes in this
        # container (st31) and points at real domains elsewhere
        from .opensearch_http import http_opensearch_factory

        factory = http_opensearch_factory(
            hosts,
            region=region,
            service=service,
            access_key=cfg.extra.get("aws_access_key"),
            secret_key=cfg.extra.get("aws_secret_key"),
            session_token=cfg.extra.get("aws_session_token"),
        )
    if factory is None:
        try:
            import opensearchpy  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "opensearch sink requires opensearch-py (not in this container); "
                "use sink_format='parquet', or extra.transport='http' for the "
                "engine's dependency-free REST transport"
            ) from e
        factory = _default_opensearch_factory(hosts, region, service)

    knn_knobs = {
        k[len("knn_"):]: v for k, v in cfg.extra.items() if k.startswith("knn_")
    }
    dimension = cfg.resolved_dim()
    # Bootstrap once per writer, lazily on the first batch (the driver
    # runs foreachBatch, so the single create-if-missing call happens
    # driver-side — the reference does the same from a one-shot lambda
    # before the Flink job starts).
    pending_bootstrap = [bool(cfg.extra.get("bootstrap_index", True))]

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        if pending_bootstrap[0]:
            client, _ = factory()
            ensure_knn_index(client, index, dimension, **knn_knobs)
            pending_bootstrap[0] = False
        # embed() only carries an error column under the dead-letter
        # policy; under drop/fail the column is absent and there is
        # nothing to filter (guard mirrors _parquet_writer's has_error).
        good = batch
        if "error" in batch.columns:
            good = batch.filter(F.col("error").isNull())
        by_id = bool(cfg.extra.get("index_by_id"))
        docs = to_sink_docs(good, include_id=by_id)

        def send_partition(rows) -> None:
            first = next(iter(rows), None)
            if first is None:
                return  # empty partition: never build a client
            import itertools

            client, bulk = factory()
            actions = (
                {
                    "_index": index,
                    **({"_id": row._id} if by_id else {}),
                    "_source": {
                        "passage_embedding": row.passage_embedding,
                        "date": row.date.isoformat() if row.date else None,
                        "text": row.text,
                    },
                }
                for row in itertools.chain([first], rows)
            )
            bulk(client, actions)

        docs.foreachPartition(send_partition)

    return write_batch


# ---------------------------------------------------------------------------
# ACID table-format sink (Delta Lake), import-gated
# ---------------------------------------------------------------------------


def _default_delta_factory(spark, path: str):
    """Returns a DeltaTable handle for ``path`` or None when no table
    exists there yet. Import-gated: delta-spark (and its JVM jar) are
    not in this container, so the gate raises with the remedy — the
    same posture as the OpenSearch/codec gates."""
    try:
        from delta.tables import DeltaTable
    except ImportError as e:
        raise NotImplementedError(
            "delta sink requires delta-spark (pip install delta-spark and "
            "configure spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension, "
            "spark.sql.catalog.spark_catalog=org.apache.spark.sql.delta.catalog."
            "DeltaCatalog); use sink_format='parquet' with idempotent_sink "
            "for the jar-free equivalent"
        ) from e
    if DeltaTable.isDeltaTable(spark, path):
        return DeltaTable.forPath(spark, path)
    return None


def delta_upsert_writer(
    path: str,
    keys: tuple[str, ...],
    order_by: tuple[str, ...] = (),
    table_factory=_default_delta_factory,
    create_format: str = "delta",
) -> Callable[[DataFrame, int], None]:
    """foreachBatch keyed MERGE into a Delta table — st10's versioned-
    parquet upsert with real ACID semantics (the upgrade st10's
    docstring names: at 100 TB the per-batch full-table rewrite becomes
    a transactional MERGE touching only matched files, and concurrent
    readers never see a half-written version).

    Per micro-batch:
    1. the batch is reduced to ONE row per key (greatest row by
       ``order_by``, descending, then by the key — MERGE requires a
       unique source match, and a replayed batch must converge);
    2. first batch creates the table (CTAS append); later batches run
       ``MERGE ON t.k = s.k WHEN MATCHED UPDATE ALL WHEN NOT MATCHED
       INSERT ALL`` — idempotent under micro-batch replay, giving
       effectively-exactly-once sink semantics.

    ``table_factory(spark, path)`` returns a DeltaTable-like handle or
    None when the table doesn't exist; injectable (with
    ``create_format``, which the first batch's CTAS uses) so the MERGE
    composition is testable without the jar (tests/test_delta_sink.py),
    exactly like the OpenSearch client_factory."""
    from pyspark.sql import Window

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        sp = batch.sparkSession
        ordering = [F.desc(c) for c in order_by] + [F.desc(c) for c in keys]
        w = Window.partitionBy(*keys).orderBy(*ordering)
        latest = (
            batch.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        tbl = table_factory(sp, path)
        if tbl is None:
            latest.write.format(create_format).save(path)
            return
        cond = " AND ".join(f"t.{k} = s.{k}" for k in keys)
        (
            tbl.alias("t")
            .merge(latest.alias("s"), cond)
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )

    return write_batch
