"""Format-interop hardening: CSV escaping and stale-cache invalidation.

p06/p07 cache their materialized ORC/CSV copies keyed by a content
fingerprint of the source parquet — a regenerated sf_dir inside one
process must be re-materialized, not silently compared stale (ADVICE
r04). And the CSV leg must survive text that abuses the format
(commas, quotes, newlines embedded in documents)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans import (
    pipeline_extra,
)


def _write_docs(spark, sf_dir: str, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text"))
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "documents.parquet")
    )


def test_csv_roundtrip_survives_hostile_text(spark, tmp_path):
    sf = str(tmp_path / "sf_hostile")
    rows = [
        (1, 'comma, "quoted", and more', "en", "web"),
        (2, "line\nbreak and trailing space ", "en", "web"),
        (3, 'all three: ,"\n together', "de", "books"),
    ]
    _write_docs(spark, sf, rows)
    out = {
        r.lang: r
        for r in pipeline_extra.p07_csv_roundtrip(spark, sf).collect()
    }
    assert out["en"].n_docs == 2 and out["de"].n_docs == 1
    # byte-exact text preservation through write+read
    assert out["en"].total_text_chars == sum(len(t) for _, t, l, _ in rows if l == "en")
    assert out["de"].total_text_chars == len(rows[2][1])


def test_roundtrip_caches_invalidate_on_regenerated_source(spark, tmp_path):
    sf = str(tmp_path / "sf_regen")
    _write_docs(spark, sf, [(1, "first corpus version", "en", "web")])
    first_orc = pipeline_extra.p06_orc_roundtrip(spark, sf).collect()
    first_csv = pipeline_extra.p07_csv_roundtrip(spark, sf).collect()
    assert first_orc[0].n_docs == 1 and first_csv[0].n_docs == 1

    # regenerate the same sf_dir with different content: the fingerprint
    # key must force a re-materialization, not reuse the stale copy
    _write_docs(
        spark,
        sf,
        [
            (1, "second corpus version", "en", "web"),
            (2, "a brand new doc", "fr", "web"),
        ],
    )
    orc = {r.lang: r.n_docs for r in pipeline_extra.p06_orc_roundtrip(spark, sf).collect()}
    csv = {r.lang: r.n_docs for r in pipeline_extra.p07_csv_roundtrip(spark, sf).collect()}
    assert orc == {"en": 1, "fr": 1}
    assert csv == {"en": 1, "fr": 1}
