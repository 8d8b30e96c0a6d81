

def test_d35_exact_dup_spans_semantics(spark):
    """d35 contract on the fixture: duplicated spans are real (some
    docs report cross-document 8-token verbatim runs — 45/500 at
    sf0.001), fractions are well-formed, and a doc shorter than the
    span width reports zero spans without dividing by zero."""
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans import (
        get_spec,
    )

    rows = (
        get_spec("d35_exact_dup_spans")
        .build(spark, "/root/testdata/sf0.001")
        .collect()
    )
    assert len(rows) == 500
    hit = [r for r in rows if r.n_dup_spans > 0]
    assert len(hit) == 45, len(hit)
    for r in rows:
        assert 0 <= r.n_dup_spans <= r.n_spans
        expect = 0.0 if r.n_spans == 0 else round(r.n_dup_spans / r.n_spans, 6)
        assert abs(r.dup_span_frac - expect) < 1e-9
