"""s17's batch pruning claim, adversarially: per-batch top-k cut by the
rounded-sim/vec_id key must never change the result, even when huge
rounded-tie groups span partition boundaries. Fixture: many IDENTICAL
vectors (all candidates tie exactly) spread across partitions, plus a
non-ASCII m05 parity pin on the same synthetic sf_dir."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F


def test_s17_pruning_survives_cross_partition_ties(spark, tmp_path):
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark import plans

    # 8 query vectors (vec_id < 8) + 120 corpus vectors of which 100
    # are byte-identical (one big rounded-tie group) and 20 distinct.
    dim = 64
    base = [0.1] * dim
    rows = []
    for q in range(8):
        rows.append((q, [0.1 + 0.01 * q * (i % 3) for i in range(dim)], 0))
    for i in range(100):  # the tie block, scattered ids
        rows.append((8 + i * 3, base, 1))
    for i in range(20):
        rows.append((1000 + i, [0.05 * ((i + j) % 5) for j in range(dim)], 2))
    sf_dir = tmp_path / "sf"
    os.makedirs(sf_dir)
    (
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        .repartition(8)  # ties span partitions
        .write.mode("overwrite")
        .parquet(str(sf_dir / "embeddings.parquet"))
    )
    got = {
        (r["q_id"], r["rank"]): r["vec_id"]
        for r in plans.get_spec("s17_gemm_knn").build(spark, str(sf_dir)).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet/*.parquet'"
    )
    want = {
        (q, r): v
        for q, v, r in con.execute(
            plans.all_specs()["s17_gemm_knn"].oracle.replace(
                "SELECT q_id, vec_id, sim, rank", "SELECT q_id, vec_id, rank"
            )
        ).fetchall()
    }
    assert got == want
    # The tie group must resolve to the LOWEST vec_ids, proving the
    # batch cut kept the right representatives across partitions.
    assert len(got) == 40


def test_m05_oracle_matches_on_non_ascii_text(spark, tmp_path):
    """m05 hashes UTF-8 bytes; its oracle must agree on multi-byte
    text, not just the ASCII corpus (the codepoint-vs-byte divergence
    the round-6 review flagged)."""
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark import plans

    texts = [
        "café au lait № 42 — übergroß",
        "café au lait № 42 — übergroß",  # exact dup of row 0, inside the id band
        "naïve façade jalapeño",
        "чистый текст для проверки",
        "日本語のテキスト",
        "plain ascii text here",
    ]
    rows = [
        (i, t, "xx", "src0", len(t)) for i, t in enumerate(texts)
    ]
    sf_dir = tmp_path / "sf"
    os.makedirs(sf_dir)
    (
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(str(sf_dir / "documents.parquet"))
    )
    spec = plans.all_specs()["m05_payload_phash_dedup"]
    got = sorted(
        tuple(r) for r in spec.build(spark, str(sf_dir)).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet/*.parquet'"
    )
    want = sorted(tuple(r) for r in con.execute(spec.oracle).fetchall())
    assert got == want
    # The duplicated non-ASCII doc pair must surface at hamming 0.
    assert any(h == 0 for (_, _, h) in got)
