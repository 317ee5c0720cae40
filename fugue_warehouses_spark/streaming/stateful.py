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
