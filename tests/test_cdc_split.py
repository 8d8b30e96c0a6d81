"""Edge semantics for p16_cdc_apply and invariants for
d30_leakage_safe_split (both plans/pipeline_extra.py).

p16's oracle already certifies the incremental-apply algebra against a
whole-log recompute; here the tombstone edges get hand-built logs where
each case is unambiguous. d30's driver row certifies values; here the
LEAKAGE invariant itself (one split per component) is pinned.
"""

from __future__ import annotations

import datetime as dt

from conftest import SF_SMOKE


def _write_events(spark, path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


def test_cdc_tombstone_edges(spark, tmp_path):
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans import (
        get_spec,
    )

    t = lambda d, h: dt.datetime(2024, 1, d, h)  # cutoff is 2024-01-16
    rows = [
        # u1: upserted pre-cutoff, deleted pre-cutoff, NO delta -> absent
        (1, t(2, 0), 1, "click", 1.0, "{}"),
        (2, t(3, 0), 1, "error", 0.0, "{}"),
        # u2: deleted pre-cutoff, delta upsert -> present with delta state
        (3, t(4, 0), 2, "error", 0.0, "{}"),
        (4, t(20, 0), 2, "view", 2.0, "{}"),
        # u3: upserted pre-cutoff, delta delete -> absent
        (5, t(5, 0), 3, "purchase", 3.0, "{}"),
        (6, t(21, 0), 3, "error", 0.0, "{}"),
        # u4: pre-cutoff only, survives with its last pre-cutoff state
        (7, t(6, 0), 4, "signup", 4.0, "{}"),
        (8, t(6, 1), 4, "click", 5.0, "{}"),
        # u5: delta-only insert -> present
        (9, t(22, 0), 5, "view", 6.0, "{}"),
        # u6: same-ts tie pre-cutoff broken by event_id (11 wins)
        (10, t(7, 0), 6, "click", 7.0, "{}"),
        (11, t(7, 0), 6, "view", 8.0, "{}"),
    ]
    _write_events(spark, str(tmp_path), rows)
    out = {
        r.user_id: r
        for r in get_spec("p16_cdc_apply").build(spark, str(tmp_path)).collect()
    }
    assert set(out) == {2, 4, 5, 6}
    assert out[2].state_type == "view" and out[2].state_value == 2.0
    assert out[4].state_type == "click" and out[4].last_event_id == 8
    assert out[5].state_value == 6.0
    assert out[6].last_event_id == 11 and out[6].state_type == "view"


def test_leakage_safe_split_invariants(spark):
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans import (
        get_spec,
    )

    rows = get_spec("d30_leakage_safe_split").build(spark, SF_SMOKE).collect()
    # every document exactly once
    ids = [r.doc_id for r in rows]
    assert len(ids) == len(set(ids)) > 0
    # THE invariant: one split per group — no near-dup pair straddles
    # the train/eval boundary
    by_group: dict[int, set[str]] = {}
    for r in rows:
        by_group.setdefault(r.group_id, set()).add(r.split)
    assert all(len(s) == 1 for s in by_group.values())
    # group label is the component minimum, so it is a member doc for
    # multi-doc groups and the doc itself for singletons
    groups = {r.group_id for r in rows}
    assert groups <= set(ids)
    # all three splits realized, train the clear majority
    from collections import Counter

    c = Counter(r.split for r in rows)
    assert set(c) == {"train", "val", "test"}
    assert c["train"] > c["val"] + c["test"]


def test_data_quality_gate_fires_on_corruption_only(spark):
    """p17's contract: every rule is ZERO on the raw tables (generator
    integrity) and every corrupted-twin rule is NON-zero (a gate that
    never fails is untested); totals match the table sizes."""
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans import (
        get_spec,
    )

    rows = get_spec("p17_data_quality_gate").build(spark, SF_SMOKE).collect()
    raw = [r for r in rows if r.dataset == "raw"]
    corr = [r for r in rows if r.dataset == "corrupted"]
    assert len(raw) == 7 and len(corr) == 4
    assert all(r.n_violations == 0 for r in raw), raw
    assert all(r.n_violations > 0 for r in corr), corr
    assert all(0 < r.n_violations < r.n_checked for r in corr)


def test_ivm_refresh_cutoff_invariance(spark):
    """p18's retraction algebra must produce the SAME view for every
    base/delta split point — including the degenerate splits where the
    whole log is base (delta empty) or all delta (cold start). The
    all-delta refresh IS the full recompute, so equality across cutoffs
    certifies incremental == recompute inside Spark alone (the driver's
    oracle certifies it cross-engine at the registered cutoff)."""
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans.pipeline_extra import (
        _ivm_refresh,
    )
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.sources.batch import (
        load_table,
    )

    ev = load_table(spark, SF_SMOKE, "events")
    views = {}
    for cutoff in ("1990-01-01", "2024-01-10", "2024-01-16", "2024-01-22", "2100-01-01"):
        views[cutoff] = {
            r.state_type: (r.n_users, r.total_value)
            for r in _ivm_refresh(ev, cutoff).collect()
        }
    ref = views["1990-01-01"]  # all-delta == full recompute
    assert ref, "empty view — testdata regression"
    for cutoff, v in views.items():
        assert v == ref, f"cutoff {cutoff} diverged from recompute"
