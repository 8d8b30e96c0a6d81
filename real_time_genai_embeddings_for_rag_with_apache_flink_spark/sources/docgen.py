"""Custom Python data source (Spark 4 ``pyspark.sql.datasource``): a
deterministic wire-format document generator.

The reference's ingress is a producer Lambda pushing JSON records
``{"text": ..., "created_at": ...}`` onto the stream
(``KDS-P/kds-producer-lambda/lambda_function.py:10-33``); the engine's
streaming twin is the rate-source fabricator
(``streaming/pipeline.py build_source``, ``source_format="rate"``).
This is the BATCH twin, written against Spark's user-defined data
source API so the engine also demonstrates source extension the
Spark-4-native way: ``spark.read.format("docgen")`` after
``spark.dataSource.register(DocGenDataSource)``.

Scale shape: ``partitions()`` declares N independent input slices and
``read(partition)`` generates one contiguous id range per slice, so the
scan parallelizes across executors exactly like any file source — no
driver-side generation, no single-partition bottleneck, and the
generator is pure arithmetic on (seed, doc_id), so any slice can be
recomputed on task retry with identical output (a requirement for
deterministic re-execution under speculative or recovered tasks).

The content derives from md5(seed:doc_id) — the same engine-portable
hex arithmetic the catalog uses everywhere (d13, s08) — so a DuckDB
oracle regenerates the identical corpus from ``generate_series``.
"""

from __future__ import annotations

import hashlib
import json
from datetime import datetime, timedelta

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

_EPOCH = datetime(2024, 1, 1)


def wire_record(seed: int, doc_id: int) -> tuple[int, str]:
    """(doc_id, wire JSON) for one document — pure arithmetic, shared by
    the reader and its tests."""
    digest = hashlib.md5(f"{seed}:{doc_id}".encode()).hexdigest()
    created = (_EPOCH + timedelta(seconds=doc_id)).strftime(
        "%Y-%m-%dT%H:%M:%S.000Z"
    )
    return doc_id, json.dumps(
        {"text": f"synthetic text {digest}", "created_at": created},
        separators=(",", ":"),
    )


class DocGenReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 500))
        self.nparts = int(options.get("partitions", 4))
        self.seed = int(options.get("seed", 42))

    def partitions(self):
        return [InputPartition(i) for i in range(self.nparts)]

    def read(self, partition: InputPartition):
        idx = partition.value
        # contiguous ranges; the first (rows % nparts) slices get one extra
        base, extra = divmod(self.rows, self.nparts)
        start = idx * base + min(idx, extra)
        end = start + base + (1 if idx < extra else 0)
        for doc_id in range(start, end):
            yield wire_record(self.seed, doc_id)


class DocGenStreamReader(DataSourceStreamReader):
    """Streaming variant: the same deterministic corpus delivered as a
    bounded stream of micro-batches with real offset tracking.

    This is the partition-parallel ``DataSourceStreamReader`` (not the
    driver-prefetching Simple variant): the driver only moves the
    offset cursor — ``latestOffset`` advances by at most
    ``rows_per_batch`` per micro-batch until ``max_rows`` — while
    ``partitions(start, end)`` splits each offset range into
    ``partitions`` slices whose ``read`` runs ON THE EXECUTORS. Replay
    of a committed range (checkpoint recovery) regenerates identical
    rows because content is pure (seed, doc_id) arithmetic — the same
    property Kafka/Kinesis get from log retention, for free."""

    def __init__(self, options: dict):
        self.max_rows = int(options.get("max_rows", 120))
        self.per_batch = int(options.get("rows_per_batch", 40))
        self.nparts = int(options.get("partitions", 4))
        self.seed = int(options.get("seed", 42))
        self._latest = 0

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def latestOffset(self) -> dict:
        self._latest = min(self._latest + self.per_batch, self.max_rows)
        return {"pos": self._latest}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["pos"], end["pos"]
        if hi <= lo:
            return [InputPartition((lo, lo))]
        cuts = [
            lo + (hi - lo) * i // self.nparts for i in range(self.nparts + 1)
        ]
        return [
            InputPartition((cuts[i], cuts[i + 1]))
            for i in range(self.nparts)
            if cuts[i + 1] > cuts[i]
        ]

    def read(self, partition: InputPartition):
        lo, hi = partition.value
        for doc_id in range(lo, hi):
            yield wire_record(self.seed, doc_id)

    def commit(self, end: dict) -> None:
        pass


class DocGenDataSource(DataSource):
    """``format("docgen")`` with options rows / partitions / seed
    (batch) and max_rows / rows_per_batch / partitions / seed
    (streaming)."""

    @classmethod
    def name(cls) -> str:
        return "docgen"

    def schema(self) -> str:
        return "doc_id bigint, value string"

    def reader(self, schema) -> DocGenReader:
        return DocGenReader(self.options)

    def streamReader(self, schema) -> DocGenStreamReader:
        return DocGenStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the docgen format on a session."""
    spark.dataSource.register(DocGenDataSource)
