#!/usr/bin/env python
"""Capture .explain("formatted") for every bench query into
plans/r12/<query>_<tag>.txt (tag = before/after).

Usage: python plans/r12/capture_plans.py <tag> [query ...]
Defaults to the full bench.BENCH_QUERIES list when no queries given.

Plan capture is analysis-side, but facets that collect during frame
construction (global-rank offsets, k-means loops, persisted-index
builds) run real jobs here — that is fine: we want the plan of the
RETURNED frame, which is what the bench times.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, REPO)

from bench import BENCH_QUERIES  # noqa: E402
from fugue_warehouses_spark.queries import QUERIES  # noqa: E402
from fugue_warehouses_spark.session import get_spark, pinned_heap_conf  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or BENCH_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="wf-plan-capture",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            **pinned_heap_conf(),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            text = f"ERROR capturing plan: {exc!r}\n"
        out = os.path.join(HERE, f"{name}_{tag}.txt")
        with open(out, "w") as f:
            f.write(text)
        print(f"[plans] {name} -> {os.path.basename(out)}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
