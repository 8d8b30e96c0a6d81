"""transformWithStateInPandas operator (operators/stateful.py
user_value_extremes) — the Spark 4 successor of applyInPandasWithState.

Executing it requires a protobuf runtime for the state-API client;
``google.protobuf`` is absent in this container, so execution rides the
operators/miniproto.py wire-format shim (installed at stateful.py
import). These tests run the REAL protocol end to end against the JVM's
RocksDB-backed state server — no skip gate since round 11; with a real
protobuf install the shim steps aside and the same tests exercise the
real runtime.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F


def _with_rocksdb(spark):
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans.streaming_queries import (
        _rocksdb_state_store,
    )

    return _rocksdb_state_store(spark)


def test_builds_streaming_plan_with_declared_schema(spark):
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.stateful import (
        user_value_extremes,
    )

    src_dir = tempfile.mkdtemp()
    batch = spark.createDataFrame(
        [(1, 1.0), (1, 3.0), (2, None)], "user_id long, value double"
    )
    batch.write.mode("overwrite").parquet(src_dir)
    src = spark.readStream.schema(batch.schema).parquet(src_dir)

    out = user_value_extremes(src)
    assert out.isStreaming
    assert [f.name for f in out.schema.fields] == [
        "user_id",
        "n_events",
        "min_value",
        "max_value",
    ]
    plan = out._jdf.queryExecution().logical().toString()
    assert "TransformWithStateInPySpark" in plan


def _run(spark, src):
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.stateful import (
        user_value_extremes,
    )

    name = f"tws_{tempfile.mkdtemp().rsplit('/', 1)[-1][-8:]}"
    with _with_rocksdb(spark):
        q = (
            user_value_extremes(src)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", tempfile.mkdtemp())
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    assert q.exception() is None, q.exception()
    return spark.table(name)


def test_running_extremes_single_batch(spark):
    src_dir = tempfile.mkdtemp()
    batch = spark.createDataFrame(
        [(1, 5.0), (1, -2.0), (2, None), (3, 7.5)],
        "user_id long, value double",
    )
    batch.write.mode("overwrite").parquet(src_dir)
    src = spark.readStream.schema(batch.schema).parquet(src_dir)

    rows = {r["user_id"]: r for r in _run(spark, src).collect()}
    assert rows[1]["n_events"] == 2
    assert rows[1]["min_value"] == -2.0 and rows[1]["max_value"] == 5.0
    # all-null user: counted, extremes NULL (SQL MIN/MAX semantics)
    assert rows[2]["n_events"] == 1
    assert rows[2]["min_value"] is None and rows[2]["max_value"] is None
    assert rows[3]["min_value"] == rows[3]["max_value"] == 7.5


def test_state_carries_across_micro_batches(spark):
    """The arbitrary-state contract: batch 2 must SEE batch 1's state —
    user 1's second emission reflects lifetime extremes, not batch-local
    ones. maxFilesPerTrigger=1 over two files forces two triggers."""
    import os

    src_dir = tempfile.mkdtemp()
    b1 = spark.createDataFrame([(1, 10.0), (1, 20.0)], "user_id long, value double")
    b2 = spark.createDataFrame([(1, -5.0)], "user_id long, value double")
    b1.coalesce(1).write.mode("overwrite").parquet(os.path.join(src_dir, "f=1"))
    b2.coalesce(1).write.mode("overwrite").parquet(os.path.join(src_dir, "f=2"))
    src = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src_dir)
    )

    out = _run(spark, src).orderBy("n_events").collect()
    emissions = [(r.n_events, r.min_value, r.max_value) for r in out]
    # one emission per batch; the later one has the lifetime extremes
    assert emissions[-1] == (3, -5.0, 20.0)
    assert len(emissions) == 2 and emissions[0] == (2, 10.0, 20.0)


def test_shim_steps_aside_when_real_protobuf_exists(spark):
    """install_state_message_shim must return whatever module is in
    sys.modules (real or shim) and never double-install."""
    import sys

    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.miniproto import (
        install_state_message_shim,
    )

    m1 = install_state_message_shim()
    m2 = install_state_message_shim()
    assert m1 is m2
    assert sys.modules["pyspark.sql.streaming.proto.StateMessage_pb2"] is m1
