"""transformWithStateInPandas operator (operators/stateful.py
user_value_extremes) — the Spark 4 successor of applyInPandasWithState.

Executing it requires the ``protobuf`` package (the state-API client
speaks protobuf to the JVM), which this container lacks, so the full
run is skip-gated exactly like the boto3/opensearch adapter tests;
plan construction and the output contract are pinned unconditionally.
"""

from __future__ import annotations

import importlib.util
import tempfile

import pytest


def _has_protobuf() -> bool:
    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        return False


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


@pytest.mark.skipif(not _has_protobuf(), reason="protobuf not installed")
def test_running_extremes_across_batches(spark):
    from pyspark.sql import functions as F

    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.stateful import (
        user_value_extremes,
    )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        src_dir = tempfile.mkdtemp()
        batch = spark.createDataFrame(
            [(1, 5.0), (1, -2.0), (2, None), (3, 7.5)],
            "user_id long, value double",
        )
        batch.write.mode("overwrite").parquet(src_dir)
        src = spark.readStream.schema(batch.schema).parquet(src_dir)

        q = (
            user_value_extremes(src)
            .writeStream.format("memory")
            .queryName("tws_extremes")
            .outputMode("append")
            .option("checkpointLocation", tempfile.mkdtemp())
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = {
            r["user_id"]: r
            for r in spark.table("tws_extremes")
            .groupBy("user_id")
            .agg(
                F.max("n_events").alias("n_events"),
                F.min("min_value").alias("min_value"),
                F.max("max_value").alias("max_value"),
            )
            .collect()
        }
        assert rows[1]["n_events"] == 2
        assert rows[1]["min_value"] == -2.0 and rows[1]["max_value"] == 5.0
        assert rows[2]["min_value"] is None and rows[2]["max_value"] is None
        assert rows[3]["min_value"] == 7.5
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
