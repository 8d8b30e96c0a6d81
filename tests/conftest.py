from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"

# r15 (r14 verdict #2): the full suite outgrew the driver's verify
# window (VERIFY_r14 recorded a truncated run at ~90% of 54 min, no
# failures shown). The heaviest statistical floors / randomized sweeps
# / determinism re-runs — re-proofs of invariants whose exactness pins
# and oracle-parity gates all stay in the default path — are marked
# @pytest.mark.slow and skipped unless SPARK_GRAFT_SLOW_TESTS=1, which
# the repo's own closing gate sets. Nothing unique to the default path
# is lost: every operator keeps at least one default-path test, the
# full DuckDB oracle replica (test_oracle_gate) always runs, and every
# restart/atomic-commit semantics test always runs.
SLOW_GATE_ENV = "SPARK_GRAFT_SLOW_TESTS"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavy statistical/randomized re-proof; skipped unless "
        f"{SLOW_GATE_ENV}=1 (the repo's closing gate runs them)",
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get(SLOW_GATE_ENV, "") == "1":
        return
    skip = pytest.mark.skip(
        reason=f"slow re-proof; set {SLOW_GATE_ENV}=1 to run"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.session import (
        build_session,
    )

    s = build_session(app_name="pytest")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def oracle_con():
    from oracle_harness import duckdb_conn

    return duckdb_conn(SF_SMOKE)
