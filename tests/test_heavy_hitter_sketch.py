"""t20 sketch-then-verify heavy hitters: on an adversarial corpus whose
vocabulary is far larger than the per-partition summary capacity, the
sketch path must still emit the exact top-30 (the Misra-Gries guarantee:
every token with tf > N/capacity survives summarization)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F


def test_sketch_matches_exact_on_large_vocab(spark):
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans import (
        get_spec,
    )

    # 40 heavy tokens (appear in many docs) drowned in a 12,000-token
    # rare vocabulary spread across partitions.
    rows = []
    for d in range(400):
        heavy = " ".join(f"heavy{i:02d}" for i in range(40) if (d + i) % 3)
        rare = " ".join(f"rare{d}_{j}" for j in range(30))
        rows.append((d, heavy + " " + rare))
    sf_dir = tempfile.mkdtemp(prefix="hh_sf_")
    (
        spark.createDataFrame(rows, "doc_id long, text string")
        .withColumn("lang", F.lit("en"))
        .withColumn("source", F.lit("stress"))
        .withColumn("n_chars", F.length("text"))
        .repartition(8)
        .write.mode("overwrite")
        .parquet(os.path.join(sf_dir, "documents.parquet"))
    )

    got = get_spec("t20_heavy_hitter_sketch").build(spark, sf_dir).collect()

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    exact = (
        docs.select(
            "doc_id",
            F.explode(
                F.split(
                    F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")),
                    r"\s+",
                )
            ).alias("token"),
        )
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.count_distinct("doc_id").alias("df"),
        )
        .orderBy(F.desc("tf"), "token")
        .limit(30)
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in exact]
    # Everything emitted is genuinely heavy (rare tokens have tf <= 2).
    assert all(r["tf"] > 100 for r in got)
