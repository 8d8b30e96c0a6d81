"""d31 weighted sampling: exp-sort math vs a pure-Python reference,
statistical weight-proportionality, plan shape, and the DSIR
composition (plans/curation.py d31_weighted_sample)."""

from __future__ import annotations

import hashlib
import math

import pytest

from conftest import SF_SMOKE

DENOM = 4294967297.0


def _ref_key(doc_id: int, w: float, salt: str = ":wsample42") -> float:
    h = hashlib.md5(f"{doc_id}{salt}".encode()).hexdigest()
    u = (int(h[:8], 16) + 1.0) / DENOM
    return -math.log(u) / w


def test_keys_match_pure_python_reference(spark):
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans import (
        get_spec,
    )
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.sources.batch import (
        load_table,
    )

    sample = get_spec("d31_weighted_sample").build(spark, SF_SMOKE).collect()
    docs = {
        r.doc_id: r.n_chars
        for r in load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "n_chars")
        .collect()
    }
    # the selected set must be exactly the reference's n smallest keys
    ref = sorted(docs, key=lambda d: (_ref_key(d, docs[d]), d))[: len(sample)]
    assert {r.doc_id for r in sample} == set(ref)
    for r in sample:
        assert r.skey == pytest.approx(
            _ref_key(r.doc_id, docs[r.doc_id]), abs=5e-7
        )


def test_selection_is_weight_proportional(spark):
    """Sanity on the E-S property: across many salts, heavy items are
    picked far more often than light ones (pure-Python simulation of
    the same construction — fast, no Spark round trips)."""
    weights = {i: (100.0 if i % 10 == 0 else 1.0) for i in range(200)}
    heavy_hits = light_hits = 0
    for salt in range(300):
        picked = sorted(
            weights, key=lambda d: _ref_key(d, weights[d], f":s{salt}")
        )[:20]
        heavy_hits += sum(1 for d in picked if weights[d] == 100.0)
        light_hits += sum(1 for d in picked if weights[d] == 1.0)
    # per-item inclusion rates: 20 heavy items carry ~2000/2180 of the
    # mass, so a heavy item should be sampled vastly more often than a
    # light one (heavy saturates near 1.0; light stays near 0.02)
    heavy_rate = heavy_hits / (300 * 20)
    light_rate = light_hits / (300 * 180)
    assert heavy_rate > 20 * light_rate
    assert heavy_rate > 0.5


def test_plan_is_take_ordered_not_global_sort(spark):
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans import (
        get_spec,
    )

    plan = (
        get_spec("d31_weighted_sample")
        .build(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_dsir_composition(spark):
    """The intended composition: weight = exp(t17's dsir_logweight).
    Verifies the sampler is weight-column-agnostic and the result is
    the reference top-n under those weights."""
    from pyspark.sql import functions as F

    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans.curation import (
        _WSAMPLE_DENOM,
        t17_dsir_weights,
    )

    dw = t17_dsir_weights(spark, SF_SMOKE).select(
        "doc_id", F.exp("dsir_logweight").alias("w")
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":dsir1"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(_WSAMPLE_DENOM)
    picked = (
        dw.select("doc_id", "w", (-F.log(u) / F.col("w")).alias("k"))
        .orderBy("k", "doc_id")
        .limit(50)
        .collect()
    )
    ws = {r.doc_id: r.w for r in dw.collect()}
    ref = sorted(ws, key=lambda d: (_ref_key(d, ws[d], ":dsir1"), d))[:50]
    assert {r.doc_id for r in picked} == set(ref)
