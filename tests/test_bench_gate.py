"""The bench harness's hazard-twin ratio gate (bench.py _RATIO_BANDS):
ambient load on a shared box can invert the absolute stress-twin
numbers (the r13 driver run read s23_stress_pack at 17.0 s vs flatsum
15.7 s — opposite of the 0.96 vs 2.62 quiet freeze), and the absolute
bands stayed silent because the swinging rows weren't banded. The gate
contract, replayed on the REAL r13 artifacts: the loaded driver run
produces ratio violations; the committed quiet freeze is clean."""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(_ROOT, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# The r13 DRIVER run's stress-twin readings (BENCH_r13.json — the load-
# poisoned box that motivated the gate), pinned inline so the test does
# not depend on which artifact generation is checked out.
_R13_DRIVER = {
    "s23_stress_pack1024d_20k": 17.0197,
    "s23_stress_flatsum_1024d_5k": 15.7055,
    "s26_stress_gemm_100kx64tok": 3.0366,
    "s26_stress_expr_100kx64tok": 13.0795,
    "w13_sweep_hot_twophase": 2.6333,
    "w13_sweep_hot_onephase": 8.6129,
    "d04_skew_guard_on": 1.762,
    "d04_skew_guard_off": 16.3155,
    "rank_stress_bucketed_5m": 2.4431,
    "rank_stress_naive_global_5m": 6.237,
}


def test_loaded_r13_driver_numbers_trip_the_ratio_gate():
    bench = _bench()
    violations = bench._check_ratio_bands(_R13_DRIVER)
    assert any("pack_vs_flatsum" in v for v in violations), violations
    # only the genuinely inverted pair trips — the gate is not a
    # blanket load detector
    assert len(violations) == 1, violations


def test_quiet_freeze_is_clean_and_all_pairs_covered():
    """The committed quiet-box freeze must pass every ratio band with
    headroom, and every _RATIO_BANDS row must actually exist in the
    frozen run (a renamed stress row would silently skip its gate)."""
    bench = _bench()
    frozen = json.loads(
        subprocess.run(
            ["git", "show", "f0b6f5f:BENCH_LOCAL.json"],
            cwd=_ROOT,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
    )["queries"]
    for fast, slow, _ in bench._RATIO_BANDS.values():
        assert fast in frozen, f"{fast} missing from the quiet freeze"
        assert slow in frozen, f"{slow} missing from the quiet freeze"
    assert bench._check_ratio_bands(frozen) == []


def test_partial_timings_do_not_crash_the_gate():
    bench = _bench()
    assert bench._check_ratio_bands({}) == []
    assert bench._check_ratio_bands({"s23_stress_pack1024d_20k": 1.0}) == []
