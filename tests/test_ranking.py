"""operators/ranking.distributed_rank: exact ROW_NUMBER equality with
the single-task window, and the plan-shape guarantee that no stage
funnels the table through one partition."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from conftest import SF_SMOKE

from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.ranking import (
    bucket_by_quantiles,
    distributed_rank,
)
from real_time_genai_embeddings_for_rag_with_apache_flink_spark.sources.batch import (
    load_table,
)


def test_distributed_rank_equals_global_row_number(spark):
    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", F.length("text").alias("klen")
    )
    got = {
        r.doc_id: r.rnk
        for r in distributed_rank(docs, ["klen", "doc_id"], "rnk").collect()
    }
    want = {
        r.doc_id: r.rnk
        for r in docs.withColumn(
            "rnk",
            F.row_number().over(Window.orderBy("klen", "doc_id")),
        ).collect()
    }
    assert got == want


def test_distributed_rank_handles_heavy_ties_and_few_buckets(spark):
    # constant first key: every row lands in ONE bucket (quantile cuts
    # collapse), ranks still exact via the doc_id tiebreak
    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", F.lit(7).alias("k")
    )
    out = distributed_rank(docs, ["k", "doc_id"], "rnk", num_buckets=4).collect()
    by_id = sorted(r.doc_id for r in out)
    assert {r.doc_id: r.rnk for r in out} == {
        d: i + 1 for i, d in enumerate(by_id)
    }


def test_distributed_rank_plan_has_no_single_partition_exchange(spark):
    """The whole point of the operator: a bare global ROW_NUMBER plans
    Exchange SinglePartition; distributed_rank must not."""
    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", F.length("text").alias("klen")
    )
    ranked = distributed_rank(docs, ["klen", "doc_id"], "rnk")
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
    # and the naive formulation DOES, which is what we are avoiding
    naive = docs.withColumn(
        "rnk", F.row_number().over(Window.orderBy("klen", "doc_id"))
    )
    naive_plan = naive._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" in naive_plan


def test_bucket_expression_is_monotone_and_value_pure(spark):
    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", F.length("text").alias("klen")
    )
    b = docs.withColumn("bkt", bucket_by_quantiles(docs, "klen", 8))
    rows = b.select("klen", "bkt").collect()
    # monotone in the value, and equal values share a bucket
    by_val: dict[int, set[int]] = {}
    for r in rows:
        by_val.setdefault(r.klen, set()).add(r.bkt)
    assert all(len(s) == 1 for s in by_val.values())
    vals = sorted(by_val)
    bkts = [next(iter(by_val[v])) for v in vals]
    assert bkts == sorted(bkts)


def test_degenerate_cut_list_warns_and_stays_exact(spark):
    """ADVICE r10: an all-NULL first key yields NO quantile cuts; the
    operator must say so (single-bucket funnel) instead of silently
    degrading — and NULL keys must land in bucket 0 as documented."""
    import warnings as _w

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", F.lit(None).cast("int").alias("k")
    )
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        expr = bucket_by_quantiles(docs, "k", 8)
        assert any(
            "no usable quantile cuts" in str(c.message) for c in caught
        ), [str(c.message) for c in caught]
    assert docs.withColumn("bkt", expr).where("bkt <> 0").count() == 0
    # ranks still exact via the tiebreak even with every key NULL
    with _w.catch_warnings():
        _w.simplefilter("ignore", RuntimeWarning)
        out = distributed_rank(docs, ["k", "doc_id"], "rnk").collect()
    by_id = sorted(r.doc_id for r in out)
    assert {r.doc_id: r.rnk for r in out} == {
        d: i + 1 for i, d in enumerate(by_id)
    }


def test_constant_key_single_bucket_warns(spark):
    """A constant first key produces ONE cut no row exceeds — invisible
    to the cut-list guard; the realized bucket histogram must warn."""
    import warnings as _w

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", F.lit(7).alias("k")
    )
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        distributed_rank(docs, ["k", "doc_id"], "rnk", num_buckets=4).collect()
    assert any(
        "single bucket" in str(c.message) for c in caught
    ), [str(c.message) for c in caught]
