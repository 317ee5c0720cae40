#!/usr/bin/env python
"""Per-query attribution profiler (guide §1: measure first).

For each bench query: one untimed warmup, then ``reps`` timed runs
(same warm best-of methodology as bench.py), while pulling Spark's own
job/stage metrics over the UI REST API, tagged per query via
setJobGroup. Records, per query:

- wall_best / wall_all: timed wall seconds;
- n_jobs / n_stages / n_tasks: scheduling volume for ONE timed run
  (job floor amplification — a 10-job query pays 10x the scheduler
  floor of a 1-job query on a noisy host);
- task_time_sec: summed executor task time (compute actually done);
- shuffle_read_mb / shuffle_write_mb: bytes through exchanges;
- python_factory: whether any stage ran Python workers.

Usage: python plans/r12/profile_queries.py OUT.json [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, REPO)

from bench import BENCH_QUERIES  # noqa: E402
from fugue_warehouses_spark.plans.checkpoint import released_after  # noqa: E402
from fugue_warehouses_spark.queries import QUERIES  # noqa: E402
from fugue_warehouses_spark.session import get_spark, pinned_heap_conf  # noqa: E402

UI_PORT = 4071


def _rest(app_id: str, path: str):
    url = f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}/{path}"
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.load(r)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/profile.json"
    names = sys.argv[2:] or BENCH_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("PROFILE_REPS", "3"))
    spark = get_spark(
        app_name="wf-profile",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
            **pinned_heap_conf(),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(64).repartition(8).mapInPandas(lambda it: it, "id long").count()
    app_id = spark.sparkContext.applicationId
    sc = spark.sparkContext

    results: dict[str, dict] = {}
    for name in names:
        fn = QUERIES[name]
        try:
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()  # warmup
            cold = time.perf_counter() - t0
        except Exception as exc:  # noqa: BLE001
            results[name] = {"error": repr(exc)}
            continue
        walls = []
        group = f"profile:{name}"
        for rep in range(reps):
            sc.setJobGroup(group if rep == reps - 1 else f"{group}:warm{rep}",
                           name)
            with released_after(spark):
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                walls.append(time.perf_counter() - t0)
        sc.setJobGroup(None, None)
        # attribute the LAST rep (tagged `group`) via REST
        jobs = [j for j in _rest(app_id, "jobs")
                if j.get("jobGroup") == group]
        stage_ids = sorted({s for j in jobs for s in j.get("stageIds", [])})
        n_tasks = task_ms = sr = sw = inb = 0
        n_stages = 0
        py = False
        for sid in stage_ids:
            try:
                attempts = _rest(app_id, f"stages/{sid}")
            except Exception:
                continue
            for st in attempts:
                if st.get("status") == "SKIPPED":
                    continue
                n_stages += 1
                n_tasks += st.get("numCompleteTasks", 0)
                task_ms += st.get("executorRunTime", 0)
                sr += st.get("shuffleReadBytes", 0)
                sw += st.get("shuffleWriteBytes", 0)
                inb += st.get("inputBytes", 0)
                if "Python" in (st.get("name") or "") or "Arrow" in (
                    st.get("name") or ""
                ):
                    py = True
        results[name] = {
            "wall_best": round(min(walls), 3),
            "wall_all": [round(w, 3) for w in walls],
            "warm0_sec": round(cold, 3),
            "n_jobs": len(jobs),
            "n_stages": n_stages,
            "n_tasks": n_tasks,
            "task_time_sec": round(task_ms / 1000.0, 3),
            "shuffle_read_mb": round(sr / 1e6, 3),
            "shuffle_write_mb": round(sw / 1e6, 3),
            "input_mb": round(inb / 1e6, 3),
            "python": py,
        }
        print(f"[profile] {name}: wall={results[name]['wall_best']} "
              f"jobs={len(jobs)} stages={n_stages} tasks={n_tasks} "
              f"task_s={results[name]['task_time_sec']}",
              file=sys.stderr, flush=True)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
