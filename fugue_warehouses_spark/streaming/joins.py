"""Stream-stream joins (Structured Streaming extension, SURVEY §2.D).

The reference has no streaming at all (SURVEY §1.1: bounded tables
only); this module is part of the engine's unbounded extension. A
stream-stream equi-join must bound BOTH sides' state or it grows
forever: Spark requires watermarks plus a time-range join condition,
and evicts buffered rows once they can no longer match
(left_time older than right watermark minus the interval, and vice
versa). State size is O(events within the interval), independent of
stream length — the property that makes this viable as a continuous
job over an unbounded event feed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str | list[str],
    left_time: str,
    right_time: str,
    within: str,
    watermark: str = "10 minutes",
    how: str = "inner",
    extra_condition: Column | None = None,
) -> DataFrame:
    """Join right-side events that occur in ``[left_time, left_time +
    within]`` for the same key — signup→purchase attribution, request→
    response pairing, and the like.

    Both inputs may be streaming (each gets ``watermark`` on its time
    column) or batch (watermark is a no-op there, so the same code
    path serves the batch-parity oracle). ``within`` is any Spark
    interval string ("1 hour"). Outer variants ('left_outer', ...)
    emit unmatched rows once the watermark proves no match can arrive.
    """
    from fugue_warehouses_spark.streaming.windows import _with_watermark

    keys = [key] if isinstance(key, str) else list(key)
    # _with_watermark casts TIMESTAMP_NTZ event time to TIMESTAMP (a
    # watermark requirement); the session TZ is pinned UTC so the cast
    # preserves values. Output times are cast back to NTZ below so the
    # batch path (where watermarking is a no-op) has the same schema.
    left = _with_watermark(left, left_time, watermark)
    right = _with_watermark(right, right_time, watermark)
    lt, rt = F.col(left_time), F.col(right_time)
    cond = (rt >= lt) & (rt <= lt + F.expr(f"INTERVAL {within}"))
    for k in keys:
        cond = (left[k] == right[k]) & cond
    if extra_condition is not None:
        cond = cond & extra_condition
    out = left.join(right, cond, how)
    # drop the duplicated key columns from the right side
    for k in keys:
        out = out.drop(right[k])
    return out.withColumn(
        left_time, F.col(left_time).cast("timestamp_ntz")
    ).withColumn(right_time, F.col(right_time).cast("timestamp_ntz"))
