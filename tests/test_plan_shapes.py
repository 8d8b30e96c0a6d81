"""Physical-plan regression tests: the catalog's scale claims, asserted.

Each query's docstring promises a plan shape (broadcast the dims, top-k
without a global sort, filters reaching the scan). These tests pin those
shapes so a refactor that silently degrades a plan — e.g. a broadcast
flipping to a sort-merge shuffle — fails CI rather than a future 100 TB
run."""

from __future__ import annotations

from conftest import SF_SMOKE

from real_time_genai_embeddings_for_rag_with_apache_flink_spark import plans


def _plan(spark, name: str) -> str:
    df = plans.get_spec(name).build(spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q05_broadcasts_all_dimensions(spark):
    plan = _plan(spark, "q05_local_supplier_volume")
    assert plan.count("BroadcastHashJoin") >= 5
    assert "SortMergeJoin" not in plan


def test_q20_topk_never_global_sorts(spark):
    plan = _plan(spark, "q20_sort_limit")
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan  # no standalone global sort operator


def test_q06_filters_reach_the_scan(spark):
    plan = _plan(spark, "q06_forecast_revenue")
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:300]


def test_q01_single_aggregation_exchange(spark):
    plan = _plan(spark, "q01_pricing_summary")
    # partial + final hash aggregate around exactly one shuffle
    assert plan.count("Exchange") == 1
    assert plan.count("HashAggregate") >= 2


def test_q02_scan_prunes_columns(spark):
    df = plans.get_spec("q02_filter_projection").build(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    # 11-column lineitem: the scan must read only what the query needs
    assert "l_comment" not in read_schema
    assert "l_partkey" not in read_schema
    assert "l_orderkey" in read_schema


def test_s01_broadcasts_query_vector(spark):
    plan = _plan(spark, "s01_topk_cosine")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "TakeOrderedAndProject" in plan


def test_q17_windows_share_one_shuffle(spark):
    plan = _plan(spark, "q17_window_topk_per_group")
    assert plan.count("Exchange") == 1  # one hash partition on o_custkey
