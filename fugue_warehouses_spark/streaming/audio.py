"""Streaming audio featurization — the §2.D leg of the audio family.

At corpus scale audio arrives as a stream (crawler output, upload
queue), not a static table; this module runs the REAL decode->frame->
featurize kernel (:func:`extensions.multimodal.audio_features`,
round 11) per micro-batch. Unlike the dedup ingests (whose match set
derives from the stream itself, forcing foreachBatch), featurization
is STATELESS — so the pipeline uses the plain streaming file sink and
gets Spark's strongest delivery guarantee for free: stateless
transform + append file sink = exactly-once (the sink's transactional
`_spark_metadata` log makes replayed batches idempotent; no
survivor-log compaction machinery needed, contrast
streaming/io.compact_survivors).

Scale shape is identical to the batch path: payloads never shuffle —
the kernel runs where the source partition lands and emits 9 integer
scalars per clip, so the feature store grows metadata-sized while the
audio bytes stay in the source. Stream==batch parity is pinned in
tests/test_streaming_audio.py (same helper, same rows, byte-identical
features), which is also what lets the batch facet's DuckDB oracle
vouch for the streaming leg.

The reference has no streaming at all (its BigQuery "read streams"
are batch scan shards — fugue_bigquery/client.py:265-271); this is
north-star extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from fugue_warehouses_spark.extensions.multimodal import audio_features


def run_audio_feature_ingest(
    stream_df: DataFrame,
    features_path: str,
    checkpoint_dir: str,
    payload_col: str = "payload",
    id_col: str = "id",
    frame_len: int = 160,
    decode_stub: bool = False,
    on_error: str = "skip",
) -> StreamingQuery:
    """Start the streaming featurization: binary payload stream ->
    integer acoustic features appended to a parquet store.

    ``on_error`` defaults to ``"skip"`` here (the batch API defaults
    to ``"raise"``): under checkpointing a failed task REPLAYS the
    same file forever, so one mp3 or truncated clip in a crawl batch
    would wedge the stream permanently. Skipped rows are dropped, not
    lost-by-accident — rows needing quarantine should be routed
    upstream with a container sniff on the payload prefix (WAV =
    ``X'52494646'``), which keeps the file-sink exactly-once story
    intact. Pass ``on_error="raise"`` for curated sources where a bad
    payload is a pipeline bug.

    ``trigger(availableNow=True)`` drains everything currently in the
    source then stops — the batch-ish invocation the tests and backfill
    jobs use; pass-through restarts with the same ``checkpoint_dir``
    process only NEW files (source offsets) and replay-safe appends
    (sink log)."""
    if not stream_df.isStreaming:
        raise ValueError("stream_df must be a streaming DataFrame")
    feats = audio_features(
        stream_df, payload_col, id_col,
        frame_len=frame_len, decode_stub=decode_stub, on_error=on_error,
    )
    return (
        feats.writeStream.format("parquet")
        .option("path", features_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
