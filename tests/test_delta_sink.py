"""Delta ACID upsert sink (streaming/sinks.delta_upsert_writer).

The delta-spark package (and its JVM jar) are not in this container, so
the MERGE composition is tested through an injected fake DeltaTable that
executes the exact MERGE-unique-source semantics over parquet — the same
injectable-client posture as the OpenSearch sink tests. A real-Delta
roundtrip runs only when the package is importable (skip otherwise)."""

from __future__ import annotations

import importlib.util
import os

import pytest
from pyspark.sql import functions as F

from real_time_genai_embeddings_for_rag_with_apache_flink_spark.streaming.sinks import (
    delta_upsert_writer,
)

HAVE_DELTA = importlib.util.find_spec("delta") is not None


class FakeMergeBuilder:
    def __init__(self, table, source, cond):
        self.table, self.source, self.cond = table, source, cond
        self.matched_update_all = False
        self.not_matched_insert_all = False

    def whenMatchedUpdateAll(self):
        self.matched_update_all = True
        return self

    def whenNotMatchedInsertAll(self):
        self.not_matched_insert_all = True
        return self

    def execute(self):
        assert self.matched_update_all and self.not_matched_insert_all
        # MERGE with a unique source and UPDATE ALL / INSERT ALL:
        # new state = source ∪ (target rows with no source key match)
        t = self.table
        keys = [
            part.split("=")[0].strip().removeprefix("t.")
            for part in self.cond.split(" AND ")
        ]
        import shutil

        sp = self.source.sparkSession
        target = sp.read.parquet(t.path)
        rows = self.source.unionByName(
            target.join(self.source.select(*keys), keys, "left_anti")
        ).collect()
        schema = target.schema
        shutil.rmtree(t.path)
        sp.createDataFrame(rows, schema).write.parquet(t.path)


class FakeDeltaTable:
    last_cond: str | None = None

    def __init__(self, path):
        self.path = path
        self._alias = None

    def alias(self, a):
        self._alias = a
        return self

    def merge(self, source, cond):
        FakeDeltaTable.last_cond = cond
        return FakeMergeBuilder(self, source, cond)


def fake_factory(spark, path):
    if not os.path.isdir(path):
        return None
    return FakeDeltaTable(path)


def test_delta_merge_composition_matches_st10_upsert(spark, tmp_path):
    """Streaming the events table through the Delta MERGE writer must
    land exactly st10's keyed-upsert state: the latest event per user."""
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans.streaming_queries import (
        stream_events,
    )

    sf_dir = "/root/testdata/sf0.001"
    path = str(tmp_path / "delta_state")
    writer = delta_upsert_writer(
        path,
        keys=("user_id",),
        order_by=("ts", "event_id"),
        table_factory=fake_factory,
        create_format="parquet",
    )
    ev = stream_events(spark, sf_dir)
    q = (
        ev.writeStream.foreachBatch(writer)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert FakeDeltaTable.last_cond == "t.user_id = s.user_id"
    got = {
        (r.user_id, r.event_id)
        for r in spark.read.parquet(path).select("user_id", "event_id").collect()
    }
    from pyspark.sql import Window
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.sources.batch import (
        load_table,
    )

    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    want = {
        (r.user_id, r.event_id)
        for r in load_table(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id")
        .collect()
    }
    assert got == want


def test_delta_writer_is_idempotent_on_batch_replay(spark, tmp_path):
    """Replaying a micro-batch (failure/recovery) must converge to the
    same table state — the ACID upgrade over a plain append sink."""
    path = str(tmp_path / "delta_replay")
    writer = delta_upsert_writer(
        path,
        keys=("k",),
        order_by=("v",),
        table_factory=fake_factory,
        create_format="parquet",
    )
    b0 = spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
    b1 = spark.createDataFrame([(2, 25), (2, 21), (3, 30)], "k long, v long")
    writer(b0, 0)
    writer(b1, 1)
    state1 = {(r.k, r.v) for r in spark.read.parquet(path).collect()}
    # in-batch dedup: k=2 keeps the greatest v (25), overwriting v=20
    assert state1 == {(1, 10), (2, 25), (3, 30)}
    writer(b1, 1)  # replay
    state2 = {(r.k, r.v) for r in spark.read.parquet(path).collect()}
    assert state2 == state1


def test_delta_gate_raises_with_remedy_when_package_absent(spark, tmp_path):
    if HAVE_DELTA:
        pytest.skip("delta-spark present; gate not exercised")
    writer = delta_upsert_writer(str(tmp_path / "t"), keys=("k",))
    b = spark.createDataFrame([(1, 1)], "k long, v long")
    with pytest.raises(NotImplementedError, match="delta-spark"):
        writer(b, 0)


@pytest.mark.skipif(not HAVE_DELTA, reason="delta-spark not installed")
def test_delta_real_roundtrip(spark, tmp_path):
    """Real Delta MERGE roundtrip — runs only where delta-spark (and its
    jar) are installed."""
    path = str(tmp_path / "real_delta")
    writer = delta_upsert_writer(path, keys=("k",), order_by=("v",))
    writer(spark.createDataFrame([(1, 10)], "k long, v long"), 0)
    writer(spark.createDataFrame([(1, 11), (2, 20)], "k long, v long"), 1)
    got = {
        (r.k, r.v)
        for r in spark.read.format("delta").load(path).collect()
    }
    assert got == {(1, 11), (2, 20)}
