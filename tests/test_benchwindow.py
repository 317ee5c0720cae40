"""benchwindow: the bench-artifact host-window policy.

The round-8 driver bench landed in a window degraded by per-job
latency bursts: untouched queries inflated 2-9x while the tpch and
numpy controls sampled clean, and only the jobfloor control saw the
regime (2.996 s start -> 3.765 s end vs its 1.3-3.6 s idle band). The
old gate consulted only tpch+numpy, computed inflation 1.4, and
FAILED four rows of git-verifiably unchanged code. These tests pin
the round-9 policy: that exact window must classify DEGRADED (refused
for staleness comparison), a clean window must classify clean, and
mild load must scale tolerance through all three controls.
"""

from __future__ import annotations

import json
from pathlib import Path

from fugue_warehouses_spark import benchwindow

# Verbatim from the r8 driver sidecar (committed at b456fa3).
R8_DEGRADED_CONTROL = {
    "jobfloor_32x_sec": 2.996,
    "numpy_matmul_sec": 0.010,
    "tpch_scan_agg_sec": 0.251,
}
R8_DEGRADED_CONTROL_END = {"jobfloor_32x_sec": 3.765, "numpy_matmul_sec": 0.014}

# Verbatim from the committed r8 clean-window sidecar (469241d).
R8_CLEAN_CONTROL = {
    "jobfloor_32x_sec": 2.9,
    "numpy_matmul_sec": 0.009,
    "tpch_scan_agg_sec": 0.269,
}
R8_CLEAN_CONTROL_END = {"jobfloor_32x_sec": 3.1, "numpy_matmul_sec": 0.010}


def test_r8_degraded_window_is_refused():
    state, reasons = benchwindow.classify(
        R8_DEGRADED_CONTROL, R8_DEGRADED_CONTROL_END
    )
    assert state == "degraded"
    assert any("jobfloor" in r for r in reasons)


def test_r8_clean_window_is_clean():
    state, reasons = benchwindow.classify(R8_CLEAN_CONTROL, R8_CLEAN_CONTROL_END)
    assert state == "clean"
    assert reasons == []


def test_missing_controls_classify_clean():
    # pre-round-8 artifacts have no jobfloor / no control_end: fall
    # back to plain inflation scaling, never a spurious refusal
    assert benchwindow.classify(None, None) == ("clean", [])
    assert benchwindow.classify({"tpch_scan_agg_sec": 0.4}, None)[0] == "clean"


def test_numpy_burst_is_refused():
    # the r7-style regime: numpy 4x idle at end
    state, reasons = benchwindow.classify(
        {"numpy_matmul_sec": 0.01}, {"numpy_matmul_sec": 0.041}
    )
    assert state == "degraded"
    assert any("numpy" in r for r in reasons)


def test_inflation_scales_with_mild_load_on_any_control():
    # idle window -> 1.0
    assert benchwindow.inflation(R8_CLEAN_CONTROL, R8_CLEAN_CONTROL_END) == 1.0
    # tpch at 2x idle -> 2.0
    infl = benchwindow.inflation({"tpch_scan_agg_sec": 0.98}, None)
    assert abs(infl - 2.0) < 1e-9
    # numpy at 1.5x -> 1.5 even when tpch is clean
    infl = benchwindow.inflation(
        {"tpch_scan_agg_sec": 0.30, "numpy_matmul_sec": 0.015}, None
    )
    assert abs(infl - 1.5) < 1e-9
    # a fast window never tightens the gate
    assert benchwindow.inflation({"tpch_scan_agg_sec": 0.1}, None) == 1.0
    # capped at the degraded threshold (such a window should have
    # been refused by classify anyway)
    assert (
        benchwindow.inflation({"numpy_matmul_sec": 1.0}, None)
        == benchwindow.DEGRADED_RATIO
    )


def test_committed_sidecar_matches_its_recorded_verdict():
    """If the committed sidecar carries a window verdict (written by
    bench.py from round 9 on), it must agree with a recomputation from
    its own controls — the flag can't be edited independently."""
    sidecar = Path(__file__).resolve().parent.parent / "bench_queries.json"
    if not sidecar.exists():
        return
    data = json.loads(sidecar.read_text())
    recorded = (data.get("window") or {}).get("state")
    if recorded is None:
        return
    state, _ = benchwindow.classify_sidecar(data)
    assert recorded == state
