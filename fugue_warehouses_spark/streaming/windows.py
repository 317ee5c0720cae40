"""Event-time windowed aggregation — batch/stream-unified.

``F.window`` / ``F.session_window`` are plan-level constructs that work
identically on bounded and unbounded DataFrames, so each helper here
takes either; the only streaming-specific knob is the watermark, which
is applied iff the input ``isStreaming`` (a watermark on a batch frame
is a no-op anyway, but skipping it keeps batch plans clean).

Scale notes (100 TB target): windowed aggregation shuffles once on
(window, *keys); with watermarks the state store evicts windows older
than the watermark, so state is bounded by (#keys x windows-in-delay).
Sliding windows multiply state by window/slide — keep the ratio small.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _with_watermark(df: DataFrame, time_col: str, delay: str | None) -> DataFrame:
    if delay is not None and df.isStreaming:
        # Watermarks require TIMESTAMP (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE
        # on TIMESTAMP_NTZ). The session TZ is pinned to UTC, so the cast
        # is value-preserving; window bounds are cast back to NTZ below so
        # batch and streaming plans produce identical schemas.
        if dict(df.dtypes).get(time_col) == "timestamp_ntz":
            df = df.withColumn(time_col, F.col(time_col).cast("timestamp"))
        return df.withWatermark(time_col, delay)
    return df


def _agg_cols(agg_exprs: dict[str, str]) -> list:
    return [F.expr(e).alias(name) for name, e in agg_exprs.items()]


def _ntz(col: Column | str) -> Column:
    return (F.col(col) if isinstance(col, str) else col).cast("timestamp_ntz")


def tumbling_agg(
    df: DataFrame,
    time_col: str,
    duration: str,
    agg_exprs: dict[str, str],
    keys: list[str] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Non-overlapping event-time windows, e.g. duration='15 minutes'.

    Output: window_start, window_end (timestamps), keys, aggregates.
    """
    df = _with_watermark(df, time_col, watermark)
    win = F.window(F.col(time_col), duration)
    grouped = df.groupBy(win.alias("__w"), *(keys or []))
    return grouped.agg(*_agg_cols(agg_exprs)).select(
        _ntz("__w.start").alias("window_start"),
        _ntz("__w.end").alias("window_end"),
        *(keys or []),
        *[F.col(n) for n in agg_exprs],
    )


def sliding_agg(
    df: DataFrame,
    time_col: str,
    duration: str,
    slide: str,
    agg_exprs: dict[str, str],
    keys: list[str] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping windows: each event lands in duration/slide windows."""
    df = _with_watermark(df, time_col, watermark)
    win = F.window(F.col(time_col), duration, slide)
    grouped = df.groupBy(win.alias("__w"), *(keys or []))
    return grouped.agg(*_agg_cols(agg_exprs)).select(
        _ntz("__w.start").alias("window_start"),
        _ntz("__w.end").alias("window_end"),
        *(keys or []),
        *[F.col(n) for n in agg_exprs],
    )


def session_agg(
    df: DataFrame,
    time_col: str,
    gap: str,
    agg_exprs: dict[str, str],
    keys: list[str] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Session windows: a session closes after ``gap`` of inactivity.

    Window span is [first event, last event + gap). Streaming requires
    a watermark (Spark enforces this for session_window aggregation).
    """
    df = _with_watermark(df, time_col, watermark)
    win = F.session_window(F.col(time_col), gap)
    grouped = df.groupBy(win.alias("__w"), *(keys or []))
    return grouped.agg(*_agg_cols(agg_exprs)).select(
        _ntz("__w.start").alias("session_start"),
        _ntz("__w.end").alias("session_end"),
        *(keys or []),
        *[F.col(n) for n in agg_exprs],
    )
