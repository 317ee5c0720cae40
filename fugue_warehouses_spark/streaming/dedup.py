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
