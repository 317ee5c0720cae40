#!/usr/bin/env python
"""Wall-clock mini-bench: bench.py's exact per-query methodology
(1 untimed warmup + best of 3 consecutive timed runs, released_after
scope, count() action, UI off, pinned heap) for a subset of queries,
plus the numpy/jobfloor controls so readings are regime-attributable.

Usage: python plans/r11/minibench.py q1 q2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, REPO)

from fugue_warehouses_spark.plans.checkpoint import released_after  # noqa: E402
from fugue_warehouses_spark.queries import QUERIES  # noqa: E402
from fugue_warehouses_spark.session import get_spark, pinned_heap_conf  # noqa: E402


def controls(spark) -> dict:
    import numpy as np

    rng = np.random.default_rng(7)
    a = rng.standard_normal((1536, 1536))
    b = rng.standard_normal((1536, 1536))
    (a @ b).sum()
    mm = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        (a @ b).sum()
        mm = min(mm, time.perf_counter() - t0)
    jf = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(32):
            spark.range(1).count()
        jf = min(jf, time.perf_counter() - t0)
    return {"numpy_matmul_sec": round(mm, 3), "jobfloor_32x_sec": round(jf, 3)}


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="wf-minibench",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            **pinned_heap_conf(),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(64).repartition(8).mapInPandas(lambda it: it, "id long").count()
    ctrl = controls(spark)
    print(f"[minibench] control: {ctrl}", flush=True)
    out = {}
    for name in names:
        fn = QUERIES[name]
        fn(spark, sf_dir).count()  # warmup (unscoped: process caches)
        best = 1e9
        for _ in range(3):
            with released_after(spark):
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
        print(f"[minibench] {name}: {out[name]}s", flush=True)
    ctrl_end = controls(spark)
    print(f"[minibench] control_end: {ctrl_end}", flush=True)
    print(json.dumps({"queries": out, "control": ctrl, "control_end": ctrl_end}))
    spark.stop()


if __name__ == "__main__":
    main()
