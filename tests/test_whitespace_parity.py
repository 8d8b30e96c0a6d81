"""Adversarial cross-engine whitespace parity (r10 review follow-up).

Java regex ``\\s`` matches vertical tab (U+000B); RE2 (DuckDB) ``\\s``
does not; Python ``str.split()`` additionally splits on Unicode spaces
(U+00A0, U+2009, ...). The driver's testdata contains none of these
today, so entries pairing Spark ``\\s`` with DuckDB ``\\s`` stay green
by luck of the data. The round-10 entries that CLAIM portable
tokenization (t26's explicit-class token count, m06's md5-BoW towers)
must agree on a corpus built specifically from those divergent
characters — pinned here by running the real catalog builders against
their real oracles over an adversarial fixture."""

from __future__ import annotations

import os

import duckdb
import pytest

ADVERSARIAL_DOCS = [
    # (doc_id, text): every row aims at a tokenizer-divergence class
    (0, "plain ascii words"),
    (100, "vertical\x0btab separated"),  # Java \s splits, RE2 \s does not
    (200, "nbsp\xa0joined token"),  # Python str.split splits, regex \s+ does not
    (300, "thin space here"),
    (400, "  leading and trailing  "),
    (500, "tab\tand\nnewline\fand\rreturn mix"),
    # vertical tab ONLY: 0 tokens under t26's class (vtab IS a
    # separator there); m06's narrower [ \\t\\n\\f\\r] class would
    # keep it as 1 token — doc 600 exercises the difference
    (600, "\x0b"),
    (700, "   "),  # whitespace-only: 0 tokens
    (800, "unicode  \x0bsoup\tmix"),
    (900, "a"),
]


@pytest.fixture(scope="module")
def ws_sf_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("ws_fixture")
    rows = [
        (doc_id, text, "en", "src0", len(text))
        for doc_id, text in ADVERSARIAL_DOCS
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(root / "documents.parquet")
    )
    return str(root)


def _con(ws_sf_dir):
    con = duckdb.connect()
    path = os.path.join(ws_sf_dir, "documents.parquet")
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    return con


def test_t26_token_count_agrees_on_divergent_whitespace(spark, ws_sf_dir):
    """t26's n_tokens (the rank key — one disagreement reorders the
    whole curriculum) must match DuckDB exactly on every divergence
    class, including the vertical tab that \\s-based pairings get
    wrong."""
    from oracle_harness import compare

    from real_time_genai_embeddings_for_rag_with_apache_flink_spark import plans

    spec = plans.get_spec("t26_curriculum_order")
    res = compare(
        "t26_ws", spec.build(spark, ws_sf_dir), _con(ws_sf_dir), spec.oracle
    )
    assert res.strict_ok, res.detail
    # and the counts themselves hit the documented class behavior
    got = {
        r.doc_id: r.n_tokens
        for r in spec.build(spark, ws_sf_dir).collect()
    }
    assert got[100] == 3  # vertical tab IS a separator (explicit class)
    assert got[200] == 2  # nbsp is NOT (it is token bytes on both sides)
    assert got[600] == 0  # vertical-tab-only: no non-ws run
    assert got[700] == 0
    assert got[900] == 1


def test_m06_towers_agree_on_divergent_whitespace(spark, ws_sf_dir):
    """m06's md5-BoW towers tokenize payload bytes in Python and text
    in SQL — the explicit ASCII class must produce hash-identical
    retrieval on the adversarial corpus (doc_ids are multiples of 100,
    so every doc is a query: the full cross-modal matrix is exercised)."""
    from oracle_harness import compare

    from real_time_genai_embeddings_for_rag_with_apache_flink_spark import plans

    spec = plans.get_spec("m06_crossmodal_retrieval")
    res = compare(
        "m06_ws", spec.build(spark, ws_sf_dir), _con(ws_sf_dir), spec.oracle
    )
    assert res.strict_ok, res.detail
