#!/usr/bin/env python
"""part_pagerank per-phase attribution (VERDICT r10 watch item: the
facet trended 1.88 -> 2.33 -> 3.31 s across clean windows with
untouched code). Decomposes the facet into its sequential phases and
times each, warm best-of-3, so the trend can be attributed to a phase
rather than re-litigated from totals.

Phases (mirroring extensions/graph.py):
  1. edges:    cooccurrence_edges + localCheckpoint + count()
  2. width:    (numeric ids: skipped by the gate)
  3. topandas: Arrow transfer of the edge list to the driver
  4. bincount: pandas unique + numpy bincount x3 iterations
  5. back:     createDataFrame + orderBy/limit + count (result path)
"""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from fugue_warehouses_spark.extensions import graph as G  # noqa: E402
from fugue_warehouses_spark.plans.checkpoint import released_after  # noqa: E402
from fugue_warehouses_spark.queries import QUERIES, _t  # noqa: E402
from fugue_warehouses_spark.session import get_spark, pinned_heap_conf  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="wf-pagerank-phases",
        extra_conf={"spark.ui.showConsoleProgress": "false", **pinned_heap_conf()},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(64).repartition(8).mapInPandas(lambda it: it, "id long").count()

    QUERIES["part_pagerank"](spark, sf_dir).count()  # warm everything

    def best3(label, fn):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        print(f"{label}: {best:.3f}s", flush=True)
        return best

    li = _t(spark, sf_dir, "lineitem")

    def run_edges():
        with released_after(spark):
            e = G.cooccurrence_edges(li, "l_orderkey", "l_partkey")
            e = e.localCheckpoint(eager=False)
            n = e.count()
        return n

    best3("phase1_edges_checkpoint_count", run_edges)

    # build one materialized edge list for the downstream phases
    edges = G.cooccurrence_edges(li, "l_orderkey", "l_partkey").localCheckpoint(
        eager=False
    )
    n_edges = edges.count()
    print(f"n_edges: {n_edges}", flush=True)

    holder = {}

    def run_topandas():
        holder["ep"] = edges.select("src", "dst").toPandas()

    best3("phase3_topandas", run_topandas)
    ep = holder["ep"]

    def run_bincount():
        node_vals = pd.unique(pd.concat([ep["src"], ep["dst"]], ignore_index=True))
        pos = pd.Series(np.arange(len(node_vals)), index=node_vals)
        s = pos[ep["src"]].to_numpy()
        d = pos[ep["dst"]].to_numpy()
        n_loc = len(node_vals)
        deg = np.bincount(s, minlength=n_loc).astype("float64")
        r = np.full(n_loc, 1.0 / n_loc)
        for _ in range(3):
            contrib = np.bincount(d, weights=r[s] / deg[s], minlength=n_loc)
            r = (1.0 - 0.85) / n_loc + 0.85 * contrib
        holder["out"] = pd.DataFrame({"node": node_vals, "score": r})

    best3("phase4_unique_pos_bincount", run_bincount)
    out = holder["out"]

    def run_back():
        df = spark.createDataFrame(
            out,
            schema=T.StructType(
                [
                    T.StructField("node", T.LongType()),
                    T.StructField("score", T.DoubleType()),
                ]
            ),
        )
        scored = df.select(
            F.col("node").alias("part"),
            F.round(F.col("score") * 1000, 6).alias("pagerank_x1000"),
        )
        scored.orderBy(
            F.col("pagerank_x1000").desc(), F.col("part").asc()
        ).limit(100).count()

    best3("phase5_createdf_sort_limit", run_back)

    def run_full():
        with released_after(spark):
            QUERIES["part_pagerank"](spark, sf_dir).count()

    best3("full_facet", run_full)
    spark.stop()


if __name__ == "__main__":
    main()
