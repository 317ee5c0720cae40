"""Structured Streaming layer (extension — not in the reference).

The reference (fugue-warehouses) has no streaming support at all: grep
for watermark/window/state finds only the BigQuery Storage *batch* scan
shards (reference fugue_bigquery/client.py:243-271). This package adds
the thin event-stream surface SURVEY.md §2.D/§7.7 calls for, built on
Spark Structured Streaming so every operator here is unbounded-safe:

- windows: tumbling / sliding / session windowed aggregation, shared
  between batch and streaming DataFrames (same plan, same results);
- dedup: exact dedup within a watermark (bounded state);
- stateful: custom per-key running state via applyInPandasWithState;
- io: file-stream sources over the testdata parquet and memory-sink
  drain helpers for availableNow (run-to-completion) execution;
- joins: stream-stream interval joins with watermark-bounded state.
"""

from fugue_warehouses_spark.streaming.io import (
    compact_survivors,
    read_parquet_stream,
    run_available_now,
    run_merge_sink,
)
from fugue_warehouses_spark.streaming.windows import (
    session_agg,
    sliding_agg,
    tumbling_agg,
)
from fugue_warehouses_spark.streaming.dedup import (
    dedup_within_watermark,
    incremental_ingest_dedup,
    reconcile_survivors,
    run_near_dedup_ingest,
)
from fugue_warehouses_spark.streaming.embedding import (
    reconcile_embedding_survivors,
    run_embedding_dedup_ingest,
)
from fugue_warehouses_spark.streaming.joins import interval_join
from fugue_warehouses_spark.streaming.stateful import bucket_locf, running_totals

__all__ = [
    "interval_join",
    "read_parquet_stream",
    "run_available_now",
    "run_merge_sink",
    "tumbling_agg",
    "sliding_agg",
    "session_agg",
    "dedup_within_watermark",
    "incremental_ingest_dedup",
    "run_near_dedup_ingest",
    "reconcile_survivors",
    "run_embedding_dedup_ingest",
    "reconcile_embedding_survivors",
    "bucket_locf",
    "running_totals",
]
