"""p13 bucketed-join cache: staleness invalidation, pinned.

The bucketed tables are materialized once per (sf_dir, content
fingerprint) — the review-found hazard was a key that fingerprinted
only orders.parquet, silently serving a stale bucketed lineitem when a
regenerated sf_dir changed lineitem alone. This test regenerates
EXACTLY that case and requires the join to see the new rows.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans import (
    pipeline_extra,
)

SF_SMOKE = "/root/testdata/sf0.001"


def _copy_tables(dst):
    os.makedirs(dst, exist_ok=True)
    for t in ("orders", "lineitem"):
        src = os.path.join(SF_SMOKE, f"{t}.parquet")
        dst_p = os.path.join(dst, f"{t}.parquet")
        if os.path.isdir(src):
            shutil.copytree(src, dst_p)
        else:
            shutil.copy2(src, dst_p)


def test_changed_lineitem_rebuckets_even_when_orders_is_unchanged(
    spark, tmp_path
):
    sf_dir = str(tmp_path / "sf_copy")
    _copy_tables(sf_dir)
    before = {
        r.priority: r.n_lines
        for r in pipeline_extra.p13_bucketed_join(spark, sf_dir).collect()
    }

    # Regenerate ONLY lineitem: halve it. orders stays byte-identical.
    li_path = os.path.join(sf_dir, "lineitem.parquet")
    li = spark.read.parquet(li_path)
    half = li.filter(F.col("l_linenumber") == 1)
    half_rows = half.count()
    tmp_out = os.path.join(str(tmp_path), "li_new")
    half.coalesce(1).write.mode("overwrite").parquet(tmp_out)
    if os.path.isdir(li_path):
        shutil.rmtree(li_path)
    else:
        os.remove(li_path)
    shutil.copytree(tmp_out, li_path)

    after = {
        r.priority: r.n_lines
        for r in pipeline_extra.p13_bucketed_join(spark, sf_dir).collect()
    }
    assert sum(after.values()) < sum(before.values()), (
        "p13 served a stale bucketed lineitem after the source changed "
        "— the cache key must fingerprint every materialized table"
    )
    assert sum(after.values()) == half_rows
