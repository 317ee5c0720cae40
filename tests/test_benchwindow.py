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

# Verbatim from the r9 second-boot windows: the machine rebooted onto
# a host class with ~3.3x lower dense-FLOPS throughput (numpy steady
# at 0.031-0.033 across two sessions 15 minutes apart, start AND end)
# while the scheduling path got FASTER (jobfloor 1.24-3.13 in band,
# tpch 0.321 vs 0.49 idle). A steady class shift is recordable with
# inflation carrying the real slowdown; refusing it would kill the
# gate on every boot of this class forever.
R9_SLOWHOST_CONTROL = {
    "jobfloor_32x_sec": 3.129,
    "numpy_matmul_sec": 0.033,
    "tpch_scan_agg_sec": 0.321,
}
R9_SLOWHOST_CONTROL_END = {"jobfloor_32x_sec": 1.237, "numpy_matmul_sec": 0.031}


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
    # the r7-style regime: numpy 4x idle at end — start/end DISAGREE
    # (4.1x spread), so the steady-slow-host exception must not apply
    state, reasons = benchwindow.classify(
        {"numpy_matmul_sec": 0.01}, {"numpy_matmul_sec": 0.041}
    )
    assert state == "degraded"
    assert any("numpy" in r for r in reasons)


def test_r9_steady_slow_host_window_is_recordable():
    state, reasons = benchwindow.classify(
        R9_SLOWHOST_CONTROL, R9_SLOWHOST_CONTROL_END
    )
    assert state == "clean", reasons
    # and the gate tolerance carries the REAL measured slowdown
    infl = benchwindow.inflation(R9_SLOWHOST_CONTROL, R9_SLOWHOST_CONTROL_END)
    assert abs(infl - 3.3) < 1e-9


def test_steady_slow_numpy_with_jobfloor_burst_stays_refused():
    # a steady numpy reading does NOT excuse a per-job burst regime:
    # jobfloor over band refuses the window regardless
    state, reasons = benchwindow.classify(
        {"numpy_matmul_sec": 0.033, "jobfloor_32x_sec": 3.8},
        {"numpy_matmul_sec": 0.033, "jobfloor_32x_sec": 3.9},
    )
    assert state == "degraded"
    assert any("jobfloor" in r for r in reasons)


def test_single_sample_over_threshold_stays_refused():
    # steadiness needs BOTH a start and an end sample: one reading
    # over 3x idle with no corroborating second sample is refused
    state, _ = benchwindow.classify({"numpy_matmul_sec": 0.033}, None)
    assert state == "degraded"
    # ... and tpch, which is only sampled at session start, can never
    # claim the exception
    state, _ = benchwindow.classify({"tpch_scan_agg_sec": 2.0}, None)
    assert state == "degraded"


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
    # UNCAPPED: a steady slow-host window's tolerance is its real
    # slowdown (classify refuses bursty windows before inflation is
    # ever consulted, so the old 3.0 cap only false-flagged slow-boot
    # CPU-bound rows)
    assert benchwindow.inflation({"numpy_matmul_sec": 0.05}, None) == 5.0


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
