"""The driver's correctness gate, replicated per-query at sf0.001.

Every registered catalog query runs on Spark and (when SQL-expressible)
against the DuckDB oracle; row count, column set, and an order-insensitive
canonical value representation must all match — exactly what the driver
records into CORRECTNESS_r{N}.json at sf0.01.
"""

from __future__ import annotations

import pytest

from conftest import SF_SMOKE

from real_time_genai_embeddings_for_rag_with_apache_flink_spark import plans

ALL_SPECS = plans.all_specs()


@pytest.mark.parametrize("name", sorted(ALL_SPECS))
def test_query_matches_oracle(name, spark, oracle_con):
    from oracle_harness import compare

    spec = ALL_SPECS[name]
    df = spec.build(spark, SF_SMOKE)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only check, mirrors the driver
        return
    res = compare(name, df, oracle_con, spec.oracle)
    assert res.ok, f"{name}: {res.detail}"
    # Strict driver-hash safety: pandas dtype kinds must agree per column
    # (int-vs-float / HUGEINT drift is a driver hash mismatch even when
    # values agree — r02 q27/q54) and no column may hold list cells
    # (crashes the driver's sort_values canonicalizer — r02 q29).
    assert res.dtypes_match, f"{name}: dtype drift {res.dtype_detail}"


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns  # stable, non-empty schema


def test_contract_pairing():
    """Every oracle key must have a queries() entry (driver contract)."""
    import __spark_entry__ as entry_mod

    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) == len(ALL_SPECS)
