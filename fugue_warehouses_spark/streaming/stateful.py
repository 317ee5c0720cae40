"""Custom stateful streaming operators via applyInPandasWithState.

This is the escape hatch the built-in windowed aggregations don't
cover: arbitrary per-key state evolved across micro-batches, with the
state store handling persistence/recovery. The reference has nothing
like it (no streaming at all); SURVEY.md §2.D adds it as the extension
surface for custom stateful operators.

Pattern notes for scale: state lives per key in the executor state
store (RocksDB-backed in production configs); each micro-batch shuffles
only that batch's rows on the key. Keep state values to fixed-size
scalars/structs — unbounded per-key lists belong in a sink, not state.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)


def running_totals(
    df: DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """Per-key running (count, sum) across micro-batches.

    Streaming: applyInPandasWithState keeps (count, sum) per key and
    emits the updated totals once per key per micro-batch touched.
    With a single AvailableNow batch the last emitted row per key equals
    the batch aggregate — the parity tests rely on this.

    Batch: collapses to the equivalent groupBy aggregate.
    """
    out_schema = StructType(
        [
            StructField(key_col, LongType()),
            StructField("n_events", LongType()),
            StructField("total_value", DoubleType()),
        ]
    )
    if not df.isStreaming:
        # count(value) not count(*): the streaming update drops nulls
        # before counting, so the batch collapse must too
        return df.groupBy(key_col).agg(
            F.count(F.col(value_col)).alias("n_events"),
            F.sum(F.col(value_col).cast("double")).alias("total_value"),
        )

    state_schema = StructType(
        [StructField("n", LongType()), StructField("total", DoubleType())]
    )

    def update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            vals = pdf[value_col].dropna()
            n += len(vals)
            total += float(vals.sum())
        state.update((n, total))
        yield pd.DataFrame(
            {key_col: [key[0]], "n_events": [n], "total_value": [total]}
        )

    return (
        df.select(key_col, value_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def bucket_locf(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    bucket_us: int,
) -> DataFrame:
    """Streaming twin of ``operators.timeseries.gapfill_locf``: per-key
    time-bucket downsampling with gap emission and last-observation-
    carried-forward sums, as evolving per-key state.

    Streaming semantics (update mode): when a row for a NEWER bucket
    arrives, every bucket between the open one and it is finalized and
    emitted — observed buckets with their counts, gap buckets with
    n_events=0 and the carried-forward sum. The open (latest) bucket is
    re-emitted each micro-batch as it accumulates. Rows older than the
    open bucket are dropped (the state-store analog of a watermark;
    fixed-size per-key state either way: six scalars).

    Batch: collapses to ``gapfill_locf`` — the same rows the stream
    would emit over the same data, which is what the parity test pins.
    """
    out_schema = StructType(
        [
            StructField(key_col, LongType()),
            StructField("bucket", LongType()),
            StructField("n_events", LongType()),
            StructField("locf_sum", DoubleType()),
        ]
    )
    if not df.isStreaming:
        from fugue_warehouses_spark.operators.timeseries import gapfill_locf

        return gapfill_locf(df, key_col, time_col, value_col, bucket_us)

    state_schema = StructType(
        [
            StructField("cur", LongType()),
            StructField("n", LongType()),
            StructField("sv", DoubleType()),
            StructField("sv_set", LongType()),
            StructField("locf", DoubleType()),
            StructField("locf_set", LongType()),
        ]
    )

    def update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        cur, n, sv, sv_set, locf, locf_set = (
            state.get if state.exists else (-1, 0, 0.0, 0, 0.0, 0)
        )
        parts = []
        for pdf in pdfs:
            us = (
                pd.to_datetime(pdf[time_col])
                .astype("datetime64[us]")
                .astype("int64")
            )
            parts.append(pd.DataFrame({"b": us // bucket_us, "v": pdf[value_col]}))
        ks, bs, ns, ls = [], [], [], []

        def emit(bucket, count, locf_val):
            ks.append(key[0])
            bs.append(bucket)
            ns.append(count)
            ls.append(locf_val)

        if parts:
            data = pd.concat(parts).sort_values("b", kind="stable")
            for b, v in zip(data["b"], data["v"]):
                b = int(b)
                if cur != -1 and b < cur:
                    continue  # late row behind the open bucket: dropped
                if cur == -1:
                    cur = b
                if b > cur:
                    if sv_set:
                        locf, locf_set = sv, 1
                    emit(cur, n, locf if locf_set else None)
                    for g in range(cur + 1, b):
                        emit(g, 0, locf if locf_set else None)
                    cur, n, sv, sv_set = b, 0, 0.0, 0
                n += 1
                if pd.notna(v):
                    sv += float(v)
                    sv_set = 1
        if cur != -1:
            open_locf = sv if sv_set else (locf if locf_set else None)
            emit(cur, n, open_locf)  # open-bucket snapshot (re-emitted)
        state.update((cur, n, sv, sv_set, locf, locf_set))
        yield pd.DataFrame(
            {key_col: ks, "bucket": bs, "n_events": ns, "locf_sum": ls}
        )

    out = (
        df.select(key_col, time_col, value_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    # None -> NaN through pandas float columns; restore SQL NULL so the
    # batch-collapse parity is exact
    return out.withColumn(
        "locf_sum", F.nanvl(F.col("locf_sum"), F.lit(None).cast("double"))
    )
