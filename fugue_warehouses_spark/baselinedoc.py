"""BASELINE.md claim parsing — shared by the staleness gate AND bench.

``tests/test_docs.py`` (the staleness gate) and ``bench.py`` (the
suspect re-check pass) must agree byte-for-byte on what BASELINE.md
claims for each query: round 10's gate red happened precisely because
they didn't share a trigger. The re-check pass fired only on rows over
1.5x their last-clean-artifact value, so ``orders_weighted_sample``
drifting 0.261 -> 0.358 (1.37x) was never re-run inside the window —
yet the gate then failed it against the 0.17-point claim's x2.0
tolerance (VERDICT r10 wrong #2, round-10 ADVICE). This module is the
single source of truth for:

- the markdown table scrape (``query_table_rows``) and the
  seconds-cell grammar (``parse_sec_cell``: ``x``, ``~x``, ``>x``,
  ``x-y`` bands);
- the gate tolerances (``POINT_TOLERANCE`` / ``BAND_TOLERANCE``) and
  the per-row threshold arithmetic (``gate_threshold``), scaled by the
  regime-matched control inflation (``benchwindow
  .inflation_by_regime``);
- the re-check decision itself (``recheck_names``): a row is suspect
  when it exceeds 1.5x its prior-clean-window value (burst heuristic,
  round 10) OR when its reading would FAIL its own BASELINE gate
  tolerance — so every row the gate could flag gets the end-of-window
  burst-heal pass before the artifact is written.

Pure stdlib, no Spark session: bench.py imports it before the JVM is
warm and the doc tests run it in milliseconds.
"""

from __future__ import annotations

import re
from typing import NamedTuple

# Driver-bench contention can tax warm best-of-3 numbers ~1.5x on this
# host (BASELINE's banded rows document this); the tolerance must sit
# above that noise floor so the gate only fires on REAL drift. Rows
# that legitimately wander more get an explicit lo-hi band instead.
POINT_TOLERANCE = 2.0  # sidecar value may exceed a point claim by 2x
BAND_TOLERANCE = 1.5  # ... or a band's hi end by 1.5x

# Burst heuristic (round 10): a row over this multiple of its value in
# the last clean artifact is re-checked even if far inside its gate
# tolerance — catches regressions on rows whose bands are loose.
PRIOR_RECHECK_RATIO = 1.5


class Claim(NamedTuple):
    """One BASELINE.md per-query row's enforceable content."""

    lo: float
    hi: float
    regime: str  # 'cpu' | 'sched' — which control scales its gate

    @property
    def is_band(self) -> bool:
        return self.hi > self.lo


def table_blocks(text: str) -> list[list[list[str]]]:
    """Contiguous runs of `|`-rows, one block per markdown table."""
    blocks: list[list[list[str]]] = []
    run: list[list[str]] = []
    for line in text.splitlines():
        if line.lstrip().startswith("|"):
            cells = [c.strip() for c in line.strip().strip("|").split("|")]
            run.append(cells)
        elif run:
            blocks.append(run)
            run = []
    if run:
        blocks.append(run)
    return blocks


def is_separator(cells: list[str]) -> bool:
    return all(set(c) <= set("-: ") for c in cells)


def query_table_rows(text: str) -> list[list[str]]:
    """Rows of the per-query table(s): 6-cell rows (query | duckdb |
    spark | ratio | regime | status) whose first cell is a query name
    (header/separator/TOTAL rows excluded)."""
    out = []
    for block in table_blocks(text):
        for cells in block:
            if len(cells) != 6 or is_separator(cells):
                continue
            name = cells[0]
            if name in ("query", "") or name.startswith("**TOTAL"):
                continue
            out.append(cells)
    return out


def query_name(cell: str) -> str:
    # allow an annotation suffix: "q21_waiting_suppliers (round-3 replan)"
    return cell.strip("`* ").split(" (")[0].split("(")[0].strip()


def parse_sec_cell(cell: str) -> tuple[float, float] | None:
    """Leading '~x', 'x' or 'x-y' out of a Spark-seconds cell; None for
    non-numeric cells (e.g. '— (prose)')."""
    m = re.match(r"\s*[~>]?(\d+(?:\.\d+)?)(?:\s*-\s*(\d+(?:\.\d+)?))?", cell)
    if not m:
        return None
    lo = float(m.group(1))
    hi = float(m.group(2)) if m.group(2) else lo
    return lo, hi


def query_claims(text: str) -> dict[str, Claim]:
    """{query_name: Claim} for every per-query row with a numeric
    Spark-seconds cell. Prose-documented heavies (non-numeric cells)
    are absent — neither the gate nor the re-check pass can enforce
    them."""
    claims: dict[str, Claim] = {}
    for cells in query_table_rows(text):
        parsed = parse_sec_cell(cells[2])
        if parsed is None:
            continue
        lo, hi = parsed
        claims[query_name(cells[0])] = Claim(lo, hi, cells[4])
    return claims


def gate_threshold(claim: Claim, infl_by_regime: dict[str, float]) -> float:
    """The seconds value above which the staleness gate flags this row:
    band-hi x BAND_TOLERANCE or point x POINT_TOLERANCE, scaled by the
    inflation of the control matching the row's regime. Unknown regime
    tags raise — a typo'd tag must fail loudly in BOTH consumers, not
    silently un-gate the row."""
    tol = BAND_TOLERANCE if claim.is_band else POINT_TOLERANCE
    return claim.hi * tol * infl_by_regime[claim.regime]


def append_window_history_row(
    baseline_path: str,
    payload: dict,
    state: str,
    label: str | None = None,
) -> None:
    """Append a just-recorded bench window's row to BASELINE.md's
    Window history table (round 11). bench.py calls this whenever it
    writes the MAIN sidecar path, so the table stays current even for
    windows recorded by automation — without this, any refresh the
    builder didn't hand-document would turn the history pinning test
    red on a tree state nobody saw (the r10 staleness-gate failure
    mode, reborn one table over). Degraded windows are quarantined and
    never reach the main path, so they never get a row here."""
    import time as _time

    label = label or "auto " + _time.strftime(
        "%Y-%m-%dT%H:%MZ", _time.gmtime()
    )
    c = payload.get("control") or {}
    e = payload.get("control_end") or {}

    def _pair(key: str) -> str:
        return f"{c.get(key, '—')}/{e.get(key, '—')}"

    row = (
        f"| {label} | {payload.get('value', '—')} "
        f"| {len(payload.get('queries') or {})} "
        f"| {_pair('numpy_matmul_sec')} "
        f"| {c.get('tpch_scan_agg_sec', '—')} "
        f"| {_pair('jobfloor_32x_sec')} "
        f"| {len(payload.get('recheck') or {})} "
        f"| {state} |"
    )
    with open(baseline_path) as f:
        lines = f.read().splitlines(keepends=True)
    start = next(
        i for i, ln in enumerate(lines)
        if ln.startswith("## Window history")
    )
    last_row = None
    for i in range(start + 1, len(lines)):
        if lines[i].startswith("## "):
            break
        if lines[i].lstrip().startswith("|"):
            last_row = i
    if last_row is None:
        raise ValueError("Window history table not found in BASELINE.md")
    lines.insert(last_row + 1, row + "\n")
    with open(baseline_path, "w") as f:
        f.write("".join(lines))


def recheck_names(
    timings: dict[str, float],
    prior: dict[str, float],
    claims: dict[str, Claim],
    infl_by_regime: dict[str, float],
) -> set[str]:
    """Rows the suspect re-check pass must re-run before the sidecar is
    written: over PRIOR_RECHECK_RATIO x their last-clean-window value
    (burst heuristic), or over their own BASELINE gate threshold
    (round-11 trigger — any reading that would fail the gate gets the
    burst-heal pass first; VERDICT r10 wrong #2)."""
    out = set()
    for name, sec in timings.items():
        if name in prior and prior[name] > 0 and (
            sec > PRIOR_RECHECK_RATIO * prior[name]
        ):
            out.add(name)
        claim = claims.get(name)
        if claim is not None and sec > gate_threshold(claim, infl_by_regime):
            out.add(name)
    return out
