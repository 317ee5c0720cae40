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


def test_steady_slow_numpy_without_jobfloor_evidence_is_refused():
    # Round-10 ADVICE fix (medium): the steady exception needs at
    # least one IN-BAND jobfloor sample as positive evidence that the
    # window wasn't a per-job burst regime. A sidecar with no jobfloor
    # samples at all (old/partial artifacts, tpch-only controls) must
    # not combine "numpy steady at start and end" with uncapped
    # inflation into an arbitrarily loose clean window.
    state, reasons = benchwindow.classify(
        {"numpy_matmul_sec": 0.1}, {"numpy_matmul_sec": 0.1}
    )
    assert state == "degraded"
    assert any("numpy" in r for r in reasons)


def test_zero_control_sample_never_reaches_the_steadiness_ratio():
    # a 0.0 reading (sub-ms rounded down in an old sidecar) is dropped
    # by _samples; the remaining single sample cannot vouch for
    # steadiness, and classify must return a verdict, not divide by
    # zero (round-10 ADVICE, low)
    state, _ = benchwindow.classify(
        {"numpy_matmul_sec": 0.0, "jobfloor_32x_sec": 2.0},
        {"numpy_matmul_sec": 0.05, "jobfloor_32x_sec": 2.1},
    )
    assert state == "degraded"


def test_inflation_by_regime_splits_the_controls():
    # the r9 slow class: numpy ~3.6x idle, tpch FASTER than idle.
    # cpu rows scale by the numpy ratio; sched rows must NOT inherit
    # it — their measured path never degraded (VERDICT r9 wrong #3:
    # the global max let scheduling rows tolerate ~8x, which is where
    # an events_running_totals-style burst hides).
    infl = benchwindow.inflation_by_regime(
        R9_SLOWHOST_CONTROL, R9_SLOWHOST_CONTROL_END
    )
    assert abs(infl["cpu"] - 3.3) < 1e-9
    assert infl["sched"] == 1.0
    # idle window: both floored at 1.0
    infl = benchwindow.inflation_by_regime(R8_CLEAN_CONTROL, R8_CLEAN_CONTROL_END)
    assert infl == {"cpu": 1.0, "sched": 1.0}
    # a genuinely slow scheduling path scales sched rows
    infl = benchwindow.inflation_by_regime({"tpch_scan_agg_sec": 0.98}, None)
    assert abs(infl["sched"] - 2.0) < 1e-9 and infl["cpu"] == 1.0


def test_write_sidecar_quarantines_degraded_windows(tmp_path):
    """Replay of the r9 driver refresh (VERDICT r9 wrong #1): a clean
    artifact is at bench_queries.json; a later degraded-window run
    must land at bench_queries.degraded.json and leave the clean
    comparand untouched."""
    path = str(tmp_path / "bench_queries.json")
    clean_payload = {
        "value": 62.9,
        "queries": {"q1_pricing_summary": 0.266},
        "control": R9_SLOWHOST_CONTROL,
        "control_end": R9_SLOWHOST_CONTROL_END,
    }
    written = benchwindow.write_sidecar(path, clean_payload)
    assert written == path
    assert json.loads(Path(path).read_text())["window"]["state"] == "clean"

    # verbatim r9 driver-refresh controls: jobfloor burst at start,
    # numpy start/end disagreement past the steady bound
    degraded_payload = {
        "value": 59.8,
        "queries": {"q1_pricing_summary": 0.4},
        "control": {
            "jobfloor_32x_sec": 4.185,
            "numpy_matmul_sec": 0.048,
            "tpch_scan_agg_sec": 0.361,
        },
        "control_end": {"jobfloor_32x_sec": 1.143, "numpy_matmul_sec": 0.031},
    }
    written = benchwindow.write_sidecar(path, degraded_payload)
    assert written == str(tmp_path / "bench_queries.degraded.json")
    quarantined = json.loads(Path(written).read_text())
    assert quarantined["window"]["state"] == "degraded"
    # the clean comparand survived the refresh
    survivor = json.loads(Path(path).read_text())
    assert survivor["value"] == 62.9
    assert survivor["window"]["state"] == "clean"


def test_write_sidecar_recomputes_the_window_verdict(tmp_path):
    # a payload claiming "clean" with degraded controls is reclassified
    path = str(tmp_path / "bench_queries.json")
    payload = {
        "value": 1.0,
        "window": {"state": "clean", "reasons": []},
        "control": {"jobfloor_32x_sec": 4.2},
        "control_end": None,
    }
    written = benchwindow.write_sidecar(path, payload)
    assert written.endswith(".degraded.json")
    assert not Path(path).exists()


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


def test_recheck_fires_on_gate_tolerance_not_only_prior_ratio():
    """Replay of the r10 gate red (VERDICT r10 wrong #2):
    orders_weighted_sample drifted 0.261 -> 0.358 s — only 1.37x its
    last-clean value, UNDER the 1.5x burst trigger, yet past its
    then-current BASELINE claim (0.17 point, sched) x2.0 = 0.34. The
    window re-checked 39 other rows but not the one that then failed
    the gate. The round-11 trigger (baselinedoc.recheck_names) must
    put the row in the recheck set. The claim is replayed at its r10
    state because the row has since been banded — the test pins the
    MECHANISM, not the current table."""
    from fugue_warehouses_spark import baselinedoc as B

    # the r10 driver-refresh window's controls (bench_queries.json at
    # commit 8461f12): steady slow class, sched inflation floored at 1
    infl = benchwindow.inflation_by_regime(
        {"numpy_matmul_sec": 0.035, "tpch_scan_agg_sec": 0.309,
         "jobfloor_32x_sec": 3.354},
        None,
    )
    assert infl["sched"] == 1.0  # tpch faster than idle -> floor
    claims = {"orders_weighted_sample": B.Claim(0.17, 0.17, "sched")}
    timings = {"orders_weighted_sample": 0.358}
    prior = {"orders_weighted_sample": 0.261}
    assert "orders_weighted_sample" in B.recheck_names(
        timings, prior, claims, infl
    )
    # and the burst trigger alone would have missed it — the r10 hole
    assert timings["orders_weighted_sample"] <= (
        B.PRIOR_RECHECK_RATIO * prior["orders_weighted_sample"]
    )


def test_recheck_prior_ratio_trigger_still_fires():
    """The round-10 burst heuristic survives the round-11 merge: a row
    far inside its (loose) band but 2x its last-clean value is still
    suspect — loose bands must not absorb real regressions silently."""
    from fugue_warehouses_spark import baselinedoc as B

    infl = {"cpu": 1.0, "sched": 1.0}
    claims = {"q": B.Claim(0.2, 2.0, "sched")}  # loose band, hi=2.0
    assert "q" in B.recheck_names({"q": 0.9}, {"q": 0.4}, claims, infl)
    # in-band AND under the prior ratio: not suspect
    assert not B.recheck_names({"q": 0.5}, {"q": 0.4}, claims, infl)


def test_recheck_gate_trigger_scales_with_regime_inflation():
    """A slow-class window must not re-check every cpu row: the gate
    trigger scales by the regime-matched control, same as the gate."""
    from fugue_warehouses_spark import baselinedoc as B

    infl = {"cpu": 3.5, "sched": 1.0}
    claims = {"k": B.Claim(0.3, 0.3, "cpu")}
    # 0.9 > 0.3*2.0 unscaled, but under 0.3*2.0*3.5 — not suspect on
    # the slow class (no prior)
    assert not B.recheck_names({"k": 0.9}, {}, claims, infl)
    assert "k" in B.recheck_names({"k": 2.2}, {}, claims, infl)


def test_r10_refresh_window_classifies_clean_noisy():
    """The exact r10 driver-refresh shape (VERDICT r10 next #6):
    controls clean (steady slow class), yet 39 suspect re-checks fired
    and the total sat 17% above the committed window. Under the
    two-tier policy that window silently became the gate comparand AND
    a potential re-band source; the third tier records it but forbids
    re-banding from it."""
    data = {
        "control": {"numpy_matmul_sec": 0.033, "tpch_scan_agg_sec": 0.32,
                    "jobfloor_32x_sec": 3.354},
        "control_end": {"numpy_matmul_sec": 0.038,
                        "jobfloor_32x_sec": 1.784},
        "recheck": {f"q{i}": 1.0 for i in range(39)},
    }
    state, reasons = benchwindow.classify_sidecar(data)
    assert state == "clean-noisy"
    assert any("re-band" in r for r in reasons)
    # same controls with few re-checks: plain clean
    data["recheck"] = {"q0": 1.0}
    assert benchwindow.classify_sidecar(data)[0] == "clean"
    # degraded controls dominate the recheck count
    data["recheck"] = {f"q{i}": 1.0 for i in range(39)}
    data["control"]["jobfloor_32x_sec"] = 4.5
    assert benchwindow.classify_sidecar(data)[0] == "degraded"


def test_write_sidecar_keeps_clean_noisy_at_the_main_path(tmp_path):
    """clean-noisy is recordable: the gate must enforce against the
    latest recordable window, so it lands at the main sidecar path
    (with its verdict recorded), not in quarantine."""
    payload = {
        "control": {"numpy_matmul_sec": 0.01, "tpch_scan_agg_sec": 0.49,
                    "jobfloor_32x_sec": 2.0},
        "control_end": {"numpy_matmul_sec": 0.011,
                        "jobfloor_32x_sec": 2.1},
        "recheck": {f"q{i}": 1.0 for i in range(25)},
        "queries": {"q1": 0.5},
    }
    target = str(tmp_path / "bench_queries.json")
    written = benchwindow.write_sidecar(target, payload)
    assert written == target
    got = json.loads(Path(target).read_text())
    assert got["window"]["state"] == "clean-noisy"


def test_append_window_history_row_roundtrip(tmp_path):
    """bench.py appends the just-recorded window's row to BASELINE.md
    (round 11): the appended row must parse back with exactly the
    cells the pinning test checks — total, query count, recheck count,
    verdict — and land after the previous last row. Without the
    auto-append, a driver bench refresh turns the history test red on
    a tree state nobody saw (the r10 failure mode, one table over)."""
    from fugue_warehouses_spark import baselinedoc as B

    doc = tmp_path / "BASELINE.md"
    doc.write_text(
        "# x\n\n## Window history\n\nprose\n\n"
        "| window | total s | queries | numpy start/end | tpch "
        "| jobfloor start/end | rechecks | verdict |\n"
        "|---|---|---|---|---|---|---|---|\n"
        "| r11 end-of-round | 50.813 | 118 | 0.032/0.032 | 0.261 "
        "| 2.938/1.338 | 5 | clean |\n\n"
        "## Next section\n"
    )
    payload = {
        "value": 61.2,
        "queries": {f"q{i}": 0.5 for i in range(119)},
        "recheck": {"q1": 0.9},
        "control": {"numpy_matmul_sec": 0.033, "tpch_scan_agg_sec": 0.30,
                    "jobfloor_32x_sec": 3.0},
        "control_end": {"numpy_matmul_sec": 0.034,
                        "jobfloor_32x_sec": 1.5},
    }
    B.append_window_history_row(str(doc), payload, "clean", label="test-win")
    section = doc.read_text().split("## Window history")[1].split("\n## ")[0]
    rows = [
        cells for cells in B.table_blocks(section)[0]
        if len(cells) == 8 and not B.is_separator(cells)
        and cells[0] != "window"
    ]
    assert rows[-1][0] == "test-win"
    assert float(rows[-1][1]) == 61.2
    assert int(rows[-1][2]) == 119
    assert int(rows[-1][6]) == 1
    assert rows[-1][7] == "clean"
    # previous row intact, order preserved
    assert rows[-2][0].startswith("r11")
