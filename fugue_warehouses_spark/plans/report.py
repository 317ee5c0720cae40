"""Plan quality report: the "is this the plan I'd want at 100 TB"
checklist as a queryable structure.

tests/test_plans.py pins individual plan shapes; this module gives
users (and CI) the same signals for ANY frame: how many exchanges
(shuffles) the plan pays, whether small sides broadcast, whether
filters/column pruning reached the parquet scan, and how much of the
plan runs inside whole-stage codegen. The counters come from the
executed (physical) plan string — the same artifact ``explain()``
prints, parsed instead of eyeballed.
"""

from __future__ import annotations

import re
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class PlanReport:
    n_exchanges: int          # shuffle boundaries (excluding reused)
    n_reused_exchanges: int   # exchanges served from another branch
    n_broadcast_joins: int
    n_sortmerge_joins: int
    n_nested_loop_joins: int  # cartesian/BNLJ — usually a red flag
    n_scans: int
    n_scans_with_pushed_filters: int
    n_codegen_spans: int
    has_aqe: bool

    def as_dict(self) -> dict:
        return asdict(self)


def plan_report(df: DataFrame, run: bool = False) -> PlanReport:
    """Parse the physical plan into counters.

    With ``run=True`` the frame is executed first so AQE's FINAL plan
    (post re-planning: coalesced partitions, demoted/promoted joins,
    reused stages) is measured instead of the initial guess. The
    execution must go through THIS frame's own QueryExecution —
    ``df.count()`` would plan a different query and leave this one
    unfinalized — so the frame is collected (diagnose on a bounded
    slice of a 100 TB frame, not the frame itself).
    """
    if run:
        df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # a finalized adaptive plan prints BOTH the final and the initial
    # plan; count only the final section or everything double-counts
    cut = plan.find("== Initial Plan ==")
    if cut >= 0:
        plan = plan[:cut]
    scans = re.findall(r"FileScan \w+|Scan \w+", plan)
    pushed = re.findall(r"PushedFilters: \[(?!\])", plan)
    # codegen spans print as "*(N)" operator prefixes in the simple
    # plan string; distinct N = distinct fused pipelines
    codegen_ids = set(re.findall(r"\*\((\d+)\)", plan))
    return PlanReport(
        n_exchanges=len(re.findall(r"(?<!Reused)(?<!Broadcast)Exchange", plan)),
        n_reused_exchanges=plan.count("ReusedExchange"),
        n_broadcast_joins=plan.count("BroadcastHashJoin"),
        n_sortmerge_joins=plan.count("SortMergeJoin"),
        n_nested_loop_joins=plan.count("BroadcastNestedLoopJoin")
        + plan.count("CartesianProduct"),
        n_scans=len(scans),
        n_scans_with_pushed_filters=len(pushed),
        n_codegen_spans=len(codegen_ids),
        has_aqe="AdaptiveSparkPlan" in plan,
    )
