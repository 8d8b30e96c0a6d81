"""OpenSearch sink adapter: bulk-emitter shape without a server.

opensearch-py isn't in this container, so a stub module is injected to
verify the adapter builds the reference's exact bulk actions
({passage_embedding, date, text} per doc, createIndexRequest2 at
DataStreamJob.java:183-193) and that the import gate raises cleanly
when the client is absent.
"""

from __future__ import annotations

import sys
import types

import pytest
from pyspark.sql import functions as F

from real_time_genai_embeddings_for_rag_with_apache_flink_spark.config import (
    PipelineConfig,
)


def test_opensearch_writer_requires_client():
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.streaming.sinks import (
        foreach_batch_writer,
    )

    cfg = PipelineConfig(sink_format="opensearch")
    with pytest.raises(NotImplementedError, match="opensearch-py"):
        foreach_batch_writer(cfg)


def test_opensearch_writer_bulk_shape(spark, monkeypatch):
    captured = {}

    class FakeOpenSearch:
        def __init__(self, hosts):
            captured["hosts"] = hosts

    def fake_bulk(client, actions):
        captured["actions"] = list(actions)

    fake_mod = types.ModuleType("opensearchpy")
    fake_mod.OpenSearch = FakeOpenSearch
    fake_mod.helpers = types.SimpleNamespace(bulk=fake_bulk)
    monkeypatch.setitem(sys.modules, "opensearchpy", fake_mod)

    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.streaming.sinks import (
        foreach_batch_writer,
    )
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.embed import (
        embed,
    )

    cfg = PipelineConfig(
        sink_format="opensearch",
        extra={"index": "docs", "hosts": ["https://example:9200"]},
    )
    writer = foreach_batch_writer(cfg)

    batch = embed(
        spark.createDataFrame([("hello world",)], ["text"]).withColumn(
            "created_at", F.to_timestamp(F.lit("2024-01-01 00:00:00"))
        ),
        dim=8,
    )
    writer(batch, 0)

    assert captured["hosts"] == ["https://example:9200"]
    (action,) = captured["actions"]
    assert action["_index"] == "docs"
    src = action["_source"]
    assert set(src) == {"passage_embedding", "date", "text"}
    assert src["text"] == "hello world"
    assert len(src["passage_embedding"]) == 8
    assert src["date"].startswith("2024-01-01T00:00:00")
