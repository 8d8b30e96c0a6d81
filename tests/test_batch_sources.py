"""Round-trip tests for the JSON/CSV batch source adapters: the
documents table written out and read back must match the parquet
original exactly, and malformed rows must land in _corrupt_record
instead of failing the read."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from real_time_genai_embeddings_for_rag_with_apache_flink_spark.sources.batch import (
    load_table,
    read_csv_table,
    read_json_table,
)

SF = "/root/testdata/sf0.001"

DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def _rows(df):
    return sorted(tuple(r) for r in df.select(*DOCS_SCHEMA.names).collect())


def test_json_round_trip(spark):
    docs = load_table(spark, SF, "documents")
    out = os.path.join(tempfile.mkdtemp(prefix="src_json_"), "docs")
    docs.write.json(out)
    # Spark disallows queries whose only referenced column is the
    # corrupt-record column on raw JSON/CSV; cache first (SPARK-26108).
    back = read_json_table(spark, out, DOCS_SCHEMA).cache()
    assert back.filter(F.col("_corrupt_record").isNotNull()).count() == 0
    assert _rows(back) == _rows(docs)


def test_csv_round_trip(spark):
    docs = load_table(spark, SF, "documents")
    out = os.path.join(tempfile.mkdtemp(prefix="src_csv_"), "docs")
    docs.write.option("header", "true").option("quote", '"').option(
        "escape", '"'
    ).csv(out)
    back = read_csv_table(spark, out, DOCS_SCHEMA).cache()
    assert back.filter(F.col("_corrupt_record").isNotNull()).count() == 0
    assert _rows(back) == _rows(docs)


def test_json_corrupt_rows_dead_letter(spark):
    d = tempfile.mkdtemp(prefix="src_bad_")
    path = os.path.join(d, "part-0.json")
    with open(path, "w") as f:
        f.write('{"doc_id": 1, "text": "ok", "lang": "en", '
                '"source": "s", "n_chars": 2}\n')
        f.write("this is not json\n")
    back = read_json_table(spark, d, DOCS_SCHEMA).cache()
    good = back.filter(F.col("_corrupt_record").isNull())
    bad = back.filter(F.col("_corrupt_record").isNotNull())
    assert good.count() == 1 and bad.count() == 1
    assert bad.collect()[0]["_corrupt_record"] == "this is not json"


def test_docgen_python_datasource_partitioning(spark):
    """Custom Python data source (sources/docgen.py): declared partition
    count drives scan parallelism; uneven rows/partitions still yield
    every id exactly once; two reads are bit-identical (retry-safe)."""
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.sources.docgen import (
        register,
    )

    register(spark)

    def load(rows, parts):
        return (
            spark.read.format("docgen")
            .option("rows", str(rows))
            .option("partitions", str(parts))
            .load()
        )

    df = load(100, 7)  # uneven split
    assert df.rdd.getNumPartitions() == 7
    ids = sorted(r["doc_id"] for r in df.collect())
    assert ids == list(range(100))

    tiny = load(3, 8)  # more partitions than rows -> empty slices allowed
    assert sorted(r["doc_id"] for r in tiny.collect()) == [0, 1, 2]

    a = {tuple(r) for r in load(50, 4).collect()}
    b = {tuple(r) for r in load(50, 4).collect()}
    assert a == b


def test_docgen_wire_record_shape():
    """The wire format matches the reference producer's record shape
    ({"text", "created_at"}) and is pure arithmetic on (seed, doc_id)."""
    import json

    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.sources.docgen import (
        wire_record,
    )

    doc_id, value = wire_record(42, 7)
    assert doc_id == 7
    rec = json.loads(value)
    assert set(rec) == {"text", "created_at"}
    assert rec["text"].startswith("synthetic text ")
    assert rec["created_at"] == "2024-01-01T00:00:07.000Z"
    assert wire_record(42, 7) == (doc_id, value)
    assert wire_record(43, 7) != (doc_id, value)
