"""Host-window classification for bench artifacts.

Every bench sidecar (``bench_queries.json``) carries fixed-work host
controls measured at session START (``control``) and END
(``control_end``) — see ``bench.py:_host_controls`` and
``BASELINE.md`` §Measurement methodology. This module is the single
source of truth for (a) the idle reference values of those controls
and (b) the policy that decides whether a window's numbers are
*recordable* at all.

Why this exists (round 8 post-mortem): the driver's round-8 bench ran
in a window degraded by per-JOB latency bursts — untouched queries
inflated 2–9× while the tpch and numpy controls happened to sample
clean (0.251 / 0.010–0.014). The only control that saw the regime was
the round-8 ``jobfloor_32x`` probe (32 trivial jobs, best-of-3:
2.996 s at start → 3.765 s at end, above its 1.3–3.6 s idle band).
The staleness gate consulted only tpch+numpy, computed inflation 1.4,
and flagged 4 rows of git-verifiably unchanged code. The policy here
closes both failure modes:

- ``inflation`` consults ALL THREE controls (start and end), so a
  mild load scales the gate's tolerance instead of flagging code;
- ``classify`` marks the whole window DEGRADED when any control
  exceeds the recordable threshold — a degraded artifact is refused
  for staleness comparison (BASELINE.md's re-record policy), never
  normalized against: per-query burst regimes do not inflate every
  row uniformly, so no scalar tolerance can make the comparison
  meaningful.

The thresholds:

- numpy / tpch: ratio > ``DEGRADED_RATIO`` (3.0) over idle is
  unrecordable — this is the same cap ``inflation`` already applies,
  stated as policy rather than a silent clamp.
- jobfloor: absolute reading above ``JOBFLOOR_DEGRADED_SEC`` (3.6 s,
  the hi end of the observed idle range; the r8 degraded window read
  3.765). Ratios are meaningless for this control because its idle
  value wanders 1.3–3.6 s with scheduler JIT and heap state.
"""

from __future__ import annotations

# Idle references on this 32-core host (warm best-of-3, idle by
# vmstat; re-measure if the hardware changes). BASELINE.md documents
# the same values in prose; tests read them from HERE.
IDLE_REFERENCE = {
    "numpy_matmul_sec": 0.01,
    "tpch_scan_agg_sec": 0.49,
}
# Hi end of the observed idle range (1.3-3.6 s) for the per-job
# scheduling-floor control; absolute, not a ratio (see module doc).
JOBFLOOR_IDLE_HI_SEC = 3.6
JOBFLOOR_DEGRADED_SEC = JOBFLOOR_IDLE_HI_SEC
# A window whose fixed-work controls read more than 3x idle is too
# noisy to normalize against — re-record instead (BASELINE.md).
DEGRADED_RATIO = 3.0


def _samples(control: dict | None, control_end: dict | None, key: str):
    for block in (control, control_end):
        v = (block or {}).get(key)
        if v is not None and v > 0:
            yield float(v)


def inflation(control: dict | None, control_end: dict | None) -> float:
    """Tolerance multiplier for the staleness gate: the WORST
    measured/idle ratio across all three controls at session start
    AND end. Floored at 1.0 (a fast window never tightens the gate)
    and capped at DEGRADED_RATIO — but a window that actually hits
    the cap should be classified degraded and refused, not scaled
    (see ``classify``)."""
    ratios = [1.0]
    for key, ref in IDLE_REFERENCE.items():
        for v in _samples(control, control_end, key):
            ratios.append(v / ref)
    for v in _samples(control, control_end, "jobfloor_32x_sec"):
        ratios.append(v / JOBFLOOR_IDLE_HI_SEC)
    return min(DEGRADED_RATIO, max(ratios))


def classify(
    control: dict | None, control_end: dict | None
) -> tuple[str, list[str]]:
    """('clean' | 'degraded', [reasons]). Degraded means the window's
    numbers must not be recorded as performance claims nor compared
    against BASELINE bands — the r8 regime proved per-job bursts
    inflate individual rows 2-9x while scalar controls read nearly
    clean, so neither a point comparison nor a scaled tolerance is
    sound. Missing controls (old artifacts) classify clean: the gate
    then falls back to plain inflation scaling, as before round 9."""
    reasons: list[str] = []
    for key, ref in IDLE_REFERENCE.items():
        for v in _samples(control, control_end, key):
            if v > ref * DEGRADED_RATIO:
                reasons.append(
                    f"{key}={v} > {DEGRADED_RATIO}x idle ({ref})"
                )
    for v in _samples(control, control_end, "jobfloor_32x_sec"):
        if v > JOBFLOOR_DEGRADED_SEC:
            reasons.append(
                f"jobfloor_32x_sec={v} > idle-band hi "
                f"({JOBFLOOR_DEGRADED_SEC})"
            )
    return ("degraded" if reasons else "clean"), reasons


def classify_sidecar(data: dict) -> tuple[str, list[str]]:
    """Classify a loaded bench sidecar dict (bench_queries.json)."""
    return classify(data.get("control"), data.get("control_end"))
