"""The LSH band-bucket skew guard, pinned on an adversarial fixture.

A corpus where N documents share identical text puts all N in the same
band bucket for every band. Without a guard the band self-join emits
N(N-1)/2 pairs inside one task — the one quadratic blow-up left in the
dedup chain at 100 TB. The guard star-links oversized buckets to the
bucket's minimum doc_id: pair count stays linear in the bucket, while
connected components (d08) and survivor selection (d16) see exactly the
same duplicate clusters.

The fixture also runs the full DuckDB oracle side-by-side, so the guard
semantics are pinned to stay engine-portable, not just bounded.
"""

from __future__ import annotations

import os

import pytest

from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans import llmops

N_SPAM = 150  # well above _LSH_BUCKET_CAP (64)
N_SMALL = 4  # a legitimate small near-dup cluster, below the cap


@pytest.fixture(scope="module")
def adversarial_sf_dir(spark, tmp_path_factory):
    """A documents table with one degenerate template-spam cluster
    (N_SPAM identical docs) and one small exact-dup cluster."""
    out = str(tmp_path_factory.mktemp("lsh_skew") / "sf_adv")
    spam = "buy cheap widgets now " * 10
    small = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, spam) for i in range(N_SPAM)]
    rows += [(1000 + i, small) for i in range(N_SMALL)]
    rows += [(2000, "a completely unrelated document about spark physical plans")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from pyspark.sql import functions as F

    (
        df.withColumn("lang", F.lit("en"))
        .withColumn("source", F.lit("fixture"))
        .withColumn("n_chars", F.length("text"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(out, "documents.parquet"))
    )
    llmops.clear_intermediate_cache()
    yield out
    llmops.clear_intermediate_cache()


def test_oversized_bucket_pairs_are_linear_not_quadratic(spark, adversarial_sf_dir):
    pairs = llmops.d04_minhash_lsh_pairs(spark, adversarial_sf_dir).collect()
    spam_pairs = [r for r in pairs if r.id_a < 1000 and r.id_b < 1000]
    small_pairs = [r for r in pairs if 1000 <= r.id_a < 2000 and 1000 <= r.id_b < 2000]
    # Star linking: every spam doc pairs with doc 0 only — N-1 pairs,
    # not N(N-1)/2 ≈ 11k.
    assert len(spam_pairs) == N_SPAM - 1
    assert all(r.id_a == 0 for r in spam_pairs)
    # Buckets under the cap keep the exact all-pairs join.
    assert len(small_pairs) == N_SMALL * (N_SMALL - 1) // 2
    # No cross-cluster candidates.
    assert len(pairs) == len(spam_pairs) + len(small_pairs)


def test_components_unchanged_by_star_linking(spark, adversarial_sf_dir):
    comp = {
        r.doc_id: r.component
        for r in llmops.d08_dup_components(spark, adversarial_sf_dir).collect()
    }
    # All spam docs collapse into one component rooted at doc 0.
    assert {comp[i] for i in range(N_SPAM)} == {0}
    # The small cluster is its own component rooted at 1000.
    assert {comp[1000 + i] for i in range(N_SMALL)} == {1000}
    # The unrelated doc has no candidate pairs at all.
    assert 2000 not in comp


def test_guard_matches_duckdb_oracle_on_adversarial_corpus(
    spark, adversarial_sf_dir
):
    """The capped-pair semantics must be identical on both engines —
    otherwise the driver hash gate would diverge the day a real bucket
    crosses the cap."""
    import duckdb
    from oracle_harness import compare

    con = duckdb.connect()
    path = os.path.join(adversarial_sf_dir, "documents.parquet")
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark import plans

    for name in ("d04_minhash_lsh_pairs", "d08_dup_components"):
        spec = plans.get_spec(name)
        res = compare(name, spec.build(spark, adversarial_sf_dir), con, spec.oracle)
        assert res.ok, f"{name}: {res.detail}"


def test_bucket_cap_knob_roundtrips(spark, adversarial_sf_dir):
    """spark.graft.lshBucketCap overrides the default cap: raised above
    the spam-cluster size the join goes exact all-pairs; unset, the
    default star-link returns — and the seam cache never serves pairs
    computed under a different cap."""
    llmops.clear_intermediate_cache()
    spark.conf.set(llmops.LSH_BUCKET_CAP_CONF, str(2 * N_SPAM))
    try:
        pairs = llmops.d04_minhash_lsh_pairs(spark, adversarial_sf_dir).collect()
        spam = [r for r in pairs if r.id_a < 1000 and r.id_b < 1000]
        assert len(spam) == N_SPAM * (N_SPAM - 1) // 2
    finally:
        spark.conf.unset(llmops.LSH_BUCKET_CAP_CONF)
    # Same session, conf back to default: the cap is part of the cache
    # identity, so this must NOT reuse the exact-pairs table.
    pairs = llmops.d04_minhash_lsh_pairs(spark, adversarial_sf_dir).collect()
    spam = [r for r in pairs if r.id_a < 1000 and r.id_b < 1000]
    assert len(spam) == N_SPAM - 1
    llmops.clear_intermediate_cache()


def test_bucket_audit_surfaces_capped_buckets(spark, adversarial_sf_dir):
    """d20: every band shows exactly one capped bucket (the spam
    template) and the star-linked pair budget, so the guard's firing is
    an observable metric, not an article of faith."""
    rows = {
        r.band_idx: r
        for r in llmops.d20_lsh_bucket_audit(spark, adversarial_sf_dir).collect()
    }
    assert len(rows) == 4
    for r in rows.values():
        assert r.n_capped_buckets == 1
        assert r.max_bucket_n == N_SPAM
        # spam star pairs + small-cluster exact pairs; singletons add 0
        assert r.n_candidate_pairs == (N_SPAM - 1) + N_SMALL * (N_SMALL - 1) // 2


def test_intermediates_materialize_to_parquet_when_configured(
    spark, adversarial_sf_dir, tmp_path
):
    """The seam's restartable mode: with spark.graft.intermediateDir
    set, the dedup intermediates land as parquet tables (signatures,
    pairs, shingles) and are READ BACK from storage — a second build in
    a fresh cache reuses the written table instead of recomputing, and
    results are identical to the in-memory mode."""
    inter = str(tmp_path / "intermediates")

    llmops.clear_intermediate_cache()
    in_memory = sorted(
        (r.id_a, r.id_b)
        for r in llmops.d04_minhash_lsh_pairs(spark, adversarial_sf_dir).collect()
    )

    llmops.clear_intermediate_cache()
    spark.conf.set(llmops.INTERMEDIATE_DIR_CONF, inter)
    try:
        on_disk = sorted(
            (r.id_a, r.id_b)
            for r in llmops.d04_minhash_lsh_pairs(
                spark, adversarial_sf_dir
            ).collect()
        )
        assert on_disk == in_memory
        written = sorted(p.name.split("-")[0] for p in (tmp_path / "intermediates").iterdir())
        assert "lsh_pairs" in written and "minhash_sigs" in written

        # wipe the session cache: the next build must come from parquet
        # (prove it by poisoning nothing and checking mtimes stay put)
        import pathlib

        mtimes = {
            p: p.stat().st_mtime_ns
            for p in pathlib.Path(inter).rglob("_SUCCESS")
        }
        llmops.clear_intermediate_cache()
        again = sorted(
            (r.id_a, r.id_b)
            for r in llmops.d04_minhash_lsh_pairs(
                spark, adversarial_sf_dir
            ).collect()
        )
        assert again == in_memory
        for p, m in mtimes.items():
            assert p.stat().st_mtime_ns == m, "intermediate was rewritten"
    finally:
        spark.conf.unset(llmops.INTERMEDIATE_DIR_CONF)
        llmops.clear_intermediate_cache()


def _write_docs(spark, sf_dir: str, rows):
    from pyspark.sql import functions as F

    (
        spark.createDataFrame(rows, "doc_id long, text string")
        .withColumn("lang", F.lit("en"))
        .withColumn("source", F.lit("fixture"))
        .withColumn("n_chars", F.length("text"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(sf_dir, "documents.parquet"))
    )


def test_seam_cache_invalidates_on_source_regeneration(spark, tmp_path):
    """A regenerated sf_dir (same path, new content) must never serve
    stale intermediates — the cache key carries the source content
    fingerprint, in-memory AND in the parquet restartable mode."""
    sf_dir = str(tmp_path / "sf_regen")
    dup = "alpha beta gamma delta epsilon zeta eta theta " * 4
    _write_docs(spark, sf_dir, [(1, dup), (2, dup), (3, "one odd unrelated doc here")])

    llmops.clear_intermediate_cache()
    try:
        v1 = sorted(
            (r.id_a, r.id_b)
            for r in llmops.d04_minhash_lsh_pairs(spark, sf_dir).collect()
        )
        assert v1 == [(1, 2)]

        # Regenerate in place: now THREE identical docs. No cache clear.
        _write_docs(spark, sf_dir, [(1, dup), (2, dup), (3, dup)])
        v2 = sorted(
            (r.id_a, r.id_b)
            for r in llmops.d04_minhash_lsh_pairs(spark, sf_dir).collect()
        )
        assert v2 == [(1, 2), (1, 3), (2, 3)], "stale seam cache served v1 pairs"

        # Parquet restartable mode: the path tag carries the fingerprint,
        # so staleness cannot persist across processes either.
        inter = str(tmp_path / "inter")
        llmops.clear_intermediate_cache()
        spark.conf.set(llmops.INTERMEDIATE_DIR_CONF, inter)
        v3 = sorted(
            (r.id_a, r.id_b)
            for r in llmops.d04_minhash_lsh_pairs(spark, sf_dir).collect()
        )
        assert v3 == v2
        _write_docs(spark, sf_dir, [(1, dup), (2, dup), (3, "odd again doc text")])
        llmops.clear_intermediate_cache()  # fresh process analogue: disk persists
        v4 = sorted(
            (r.id_a, r.id_b)
            for r in llmops.d04_minhash_lsh_pairs(spark, sf_dir).collect()
        )
        assert v4 == [(1, 2)], "parquet intermediate served stale (path-only tag)"
    finally:
        if spark.conf.get(llmops.INTERMEDIATE_DIR_CONF, None):
            spark.conf.unset(llmops.INTERMEDIATE_DIR_CONF)
        llmops.clear_intermediate_cache()
