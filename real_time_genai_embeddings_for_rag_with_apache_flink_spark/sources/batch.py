"""Batch parquet sources.

The reference's only sources are stream connectors (Kinesis
``KDS-P/.../DataStreamJob.java:133-140``, Kafka ``MSK-S/...:127-135``); the
engine adds a first-class batch table surface over parquet so the same
relational operators run on bounded data. Reads are plain
``spark.read.parquet`` so Catalyst keeps predicate pushdown, column
pruning and partition pruning — at 100 TB the scan, not the operator,
dominates, and a declarative read is the only one the optimizer can prune.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale factor.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier"})


def source_fingerprint(path: str) -> str:
    """mtime+size fingerprint of a parquet file or directory-of-files.

    Used as a staleness key wherever the engine caches something derived
    from a source table (ORC/CSV materialized copies, the dedup
    intermediate seam): a regenerated source under the same path changes
    the fingerprint, so the cache re-derives instead of serving stale
    results. Remote URIs (no local stat) fingerprint as "remote" —
    callers there fall back to path-identity semantics."""
    try:
        if os.path.isdir(path):
            parts = sorted(
                (
                    f,
                    os.path.getmtime(os.path.join(path, f)),
                    os.path.getsize(os.path.join(path, f)),
                )
                for f in os.listdir(path)
            )
            return repr(parts)
        st = os.stat(path)
        return f"{st.st_mtime_ns}:{st.st_size}"
    except OSError:
        return "remote"


def spread_compute(df: DataFrame, key: str, mult: int = 1) -> DataFrame:
    """Hash-repartition ``df`` on ``key`` to ``mult`` x the cluster's
    default parallelism IF its current partitioning is narrower — the
    scan-parallelism guard for compute-dominated probe sides. A
    single-file parquet fixture arrives as ONE scan split, so any
    O(pairs)/O(rows x centroids) expression work downstream of the scan
    (broadcast-join pair folds, literal-centroid argmin scans)
    serializes on one core; a 100 TB table arrives as thousands of
    splits, ``getNumPartitions() >= target`` holds, and this returns
    the input UNCHANGED — the repartition is scale-adaptive, never a
    constant tuned for local mode. The exchange moves only the scan's
    own narrow rows (pre-join, pre-fan-out), and the EXPLICIT partition
    count keeps AQE from coalescing the KB-sized local fixture back to
    one task (AQE sizes by bytes and cannot see the downstream
    compute fan-out). Hash-keyed (never round-robin), so a retried map
    task reproduces the same row placement (SPARK-38388 discipline)."""
    from pyspark.sql import functions as F

    sc = df.sparkSession.sparkContext
    target = mult * sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, F.col(key))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        return _load_events(spark, path)
    return spark.read.parquet(path)


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    """events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects
    outright (PARQUET_TYPE_ILLEGAL). Read nanos as long and rebuild a
    microsecond TIMESTAMP_NTZ; the testdata is microsecond-aligned so the
    ns->us division is exact. The NTZ epoch base keeps the conversion
    independent of the session timezone."""
    from pyspark.sql import functions as F

    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        df = spark.read.parquet(path)
        df.schema  # force analysis while the conf is set
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        else:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
    ts_field = dict(df.dtypes).get("ts")
    if ts_field == "bigint":
        df = df.withColumn(
            "ts",
            F.expr(
                "timestampadd(MICROSECOND, ts div 1000, "
                "TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            ),
        )
    return df.select("event_id", "ts", "user_id", "event_type", "value", "props")


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql access."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_json_table(
    spark: SparkSession, path: str, schema, multiline: bool = False
) -> DataFrame:
    """JSON-lines batch source with an explicit schema (never inferred —
    schema inference is a full extra pass at 100 TB and makes the read
    non-deterministic under drift). PERMISSIVE mode + _corrupt_record
    keeps bad rows visible instead of failing the job (the engine-wide
    dead-letter posture; the reference instead throws on malformed JSON,
    CustomMessageMapFunction.java:23-25)."""
    from pyspark.sql.types import StringType, StructType

    full = StructType(schema.fields[:]).add("_corrupt_record", StringType())
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("multiLine", "true" if multiline else "false")
        .json(path)
    )


def read_csv_table(
    spark: SparkSession, path: str, schema, header: bool = True
) -> DataFrame:
    """CSV batch source with an explicit schema; quoting/escaping on so
    free-text columns round-trip. Same PERMISSIVE + corrupt-column
    posture as read_json_table."""
    from pyspark.sql.types import StringType, StructType

    full = StructType(schema.fields[:]).add("_corrupt_record", StringType())
    return (
        spark.read.schema(full)
        .option("header", "true" if header else "false")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("quote", '"')
        .option("escape", '"')
        .csv(path)
    )
