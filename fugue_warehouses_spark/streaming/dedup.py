"""Streaming deduplication with bounded state.

The batch engine's exact dedup (extensions/dedup.py) is a hash groupBy;
unbounded streams need the watermarked variant so the state store can
evict: ``dropDuplicatesWithinWatermark`` keeps a key's fingerprint only
until the watermark passes it, trading unbounded-history exactness for
bounded state — the standard choice for at-least-once ingest dedup
(e.g. replayed events with stable event_ids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_within_watermark(
    df: DataFrame,
    subset: list[str],
    time_col: str,
    delay: str,
) -> DataFrame:
    """Drop rows whose ``subset`` key was already seen within the
    watermark horizon. Batch frames fall back to plain dropDuplicates
    (same result on bounded data, where 'history' is the whole input).
    """
    if not df.isStreaming:
        return df.dropDuplicates(subset)
    ntz = dict(df.dtypes).get(time_col) == "timestamp_ntz"
    if ntz:
        # watermarks need TIMESTAMP; UTC session TZ makes this lossless
        df = df.withColumn(time_col, F.col(time_col).cast("timestamp"))
    out = df.withWatermark(time_col, delay).dropDuplicatesWithinWatermark(subset)
    if ntz:
        out = out.withColumn(time_col, F.col(time_col).cast("timestamp_ntz"))
    return out


def incremental_ingest_dedup(
    stream_df: DataFrame,
    history_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    time_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """Continuous-ingest content dedup as a STREAMING job: each
    arriving document is dropped if its normalized-text fingerprint
    (functions.text.fingerprint — the same 16-byte key the batch
    pipeline shuffles) is already in the static history table, or was
    already seen on the stream within the watermark horizon.

    The history side is a stream-static ``left_anti`` join — Spark
    re-plans the static side per micro-batch, so the history frame can
    point at the versioned fingerprint store and new versions are
    picked up without restarting the query. Within-stream dedup is
    ``dropDuplicatesWithinWatermark`` on the fingerprint: state holds
    one 16-byte key per unseen document within the horizon, evicted as
    the watermark passes — bounded regardless of stream length.

    On a batch frame this degrades to exactly
    ``extensions.dedup.incremental_dedup`` (min-id representative) —
    the batch twin the oracle checks.
    """
    from fugue_warehouses_spark.extensions.dedup import incremental_dedup
    from fugue_warehouses_spark.functions.text import fingerprint

    if not stream_df.isStreaming:
        return incremental_dedup(stream_df, history_df, text_col, id_col)
    seen = history_df.select(fingerprint(text_col).alias("__fp")).distinct()
    fresh = stream_df.withColumn("__fp", fingerprint(text_col)).join(
        seen, "__fp", "left_anti"
    )
    return dedup_within_watermark(fresh, ["__fp"], time_col, delay).drop(
        "__fp"
    )
