"""Partition-pruned scans (with bucketing, the other half of the
at-scale I/O story): a date-partitioned table read with a date filter
must touch only the matching partition directories."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_SMOKE

from real_time_genai_embeddings_for_rag_with_apache_flink_spark.sources.batch import (
    load_table,
)


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    out = str(tmp_path / "events_by_day")
    ev = load_table(spark, SF_SMOKE, "events").withColumn(
        "day", F.to_date("ts")
    )
    ev.write.partitionBy("day").parquet(out)

    n_days = ev.select("day").distinct().count()
    assert n_days > 1, "fixture must span multiple days for this test"

    read = spark.read.parquet(out)
    one_day = read.filter(F.col("day") == "2024-01-01")

    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "day" in plan

    # the pruned scan must read exactly the one partition's rows
    expected = ev.filter(F.col("day") == "2024-01-01").count()
    assert one_day.count() == expected > 0

    # and the files actually read are a strict subset: only the matching
    # partition directory (inputFiles() lists the whole table pre-pruning,
    # so check the executed scan via input_file_name)
    all_files = set(read.inputFiles())
    read_files = {
        r[0] for r in one_day.select(F.input_file_name()).distinct().collect()
    }
    assert len(read_files) < len(all_files)
    assert all("day=2024-01-01" in f for f in read_files)


def test_p11_layout_prunes_lang_partitions(spark):
    """p11's read-back must place the lang predicate in PartitionFilters
    (directory pruning), not PushedFilters (row-group filtering) — the
    difference between opening one directory and scanning them all."""
    from conftest import SF_SMOKE

    from real_time_genai_embeddings_for_rag_with_apache_flink_spark import plans

    df = plans.get_spec("p11_partitioned_layout").build(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters")[1][:300]
    assert "lang" in seg and "en" in seg, seg
