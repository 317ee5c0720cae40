#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "total_query_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}

Each query is forced with a count() (no driver materialization of
results beyond the count). Session startup is excluded; per-query time
is wall-clock for plan + execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fugue_warehouses_spark.queries import QUERIES  # noqa: E402
from fugue_warehouses_spark.session import get_spark  # noqa: E402

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_revenue_forecast",
    "q10_returned_items",
    "top_customer_per_nation",
    "rollup_order_stats",
    "take_top2_per_order",
    "events_hourly_stats",
    "events_sessionization",
    "doc_token_stats",
    "doc_quality_by_source",
    "doc_exact_dedup",
    "doc_ngram_jaccard_pairs",
    "doc_minhash_near_dups",
    "embedding_topk",
    "embedding_similar_pairs",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1")
    spark = get_spark(app_name="wf-bench")
    # one tiny action to absorb session/JVM warmup before timing
    spark.range(1).count()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = QUERIES[name]
        start = time.perf_counter()
        fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - start, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
