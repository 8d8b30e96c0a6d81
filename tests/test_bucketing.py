"""Bucketed co-located joins (the at-scale shuffle-elimination story).

At 100 TB the dominant join cost is shuffling both fact tables; writing
them bucketed by the join key lets SortMergeJoin read both sides
pre-partitioned — zero Exchange in the plan. This test proves the engine
actually gets that plan, not just that the join returns correct rows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMOKE

from real_time_genai_embeddings_for_rag_with_apache_flink_spark.sources.batch import (
    load_table,
)


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    orders = load_table(spark, SF_SMOKE, "orders")
    customer = load_table(spark, SF_SMOKE, "customer")
    for name, df, key in (
        ("b_orders", orders, "o_custkey"),
        ("b_customer", customer, "c_custkey"),
    ):
        (
            df.write.bucketBy(8, key)
            .sortBy(key)
            .option("path", str(tmp_path / name))
            .mode("overwrite")
            .saveAsTable(name)
        )
    yield "b_orders", "b_customer"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    t_orders, t_customer = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table(t_orders)
        c = spark.table(t_customer)
        joined = o.join(c, o.o_custkey == c.c_custkey).select(
            "o_orderkey", "c_name"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"

        # and it computes the same rows as the shuffled plan
        base_o = load_table(spark, SF_SMOKE, "orders")
        base_c = load_table(spark, SF_SMOKE, "customer")
        expected = (
            base_o.join(base_c, base_o.o_custkey == base_c.c_custkey)
            .select("o_orderkey", "c_name")
        )
        assert joined.count() == expected.count()
        assert (
            joined.exceptAll(expected).count() == 0
            and expected.exceptAll(joined).count() == 0
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_unbucketed_join_does_shuffle(spark):
    """Control: the same join over plain parquet must shuffle (so the
    assertion above is meaningful)."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = load_table(spark, SF_SMOKE, "orders")
        c = load_table(spark, SF_SMOKE, "customer")
        joined = o.join(c, o.o_custkey == c.c_custkey).select(
            "o_orderkey", "c_name"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
