"""Sequence packing for LLM training-data pipelines.

Concat-and-chunk packing (the GPT-style pretraining layout): documents
are laid head-to-tail on a per-shard token tape, and the tape is cut
into fixed-length sequences. A document belongs to the sequence that
contains its FIRST token (``seq_id = floor(tokens_before / seq_len)``),
which is the bookkeeping a packing dataloader needs to locate document
boundaries inside packed sequences.

Scale design: the cumulative sum is a window over ``partition_cols``
ordered by ``order_col`` — one hash shuffle on the shard key, one
in-partition sort. Packing is embarrassingly parallel across shards by
construction (each shard owns its own tape), so at 100 TB the shard
key (source, date bucket, …) is the unit of parallelism; an
unpartitioned call degenerates to a single sorted partition and is
rejected unless ``allow_global=True``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_sequences(
    df: DataFrame,
    order_col: str,
    token_count_col: str | Column,
    seq_len: int,
    partition_cols: list[str] | None = None,
    allow_global: bool = False,
    seq_id_col: str = "seq_id",
) -> DataFrame:
    """Assign each document a packed-sequence id within its shard.

    ``token_count_col`` may be a column name or an expression (e.g.
    ``TX.token_count("text")``). Output keeps every input column and
    adds ``seq_id`` (0-based within the shard) plus ``_tok_offset``,
    the document's first-token offset inside the shard tape — enough
    for a loader to slice exact sequence boundaries.
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    if not partition_cols and not allow_global:
        raise ValueError(
            "pack_sequences without partition_cols sorts the whole frame "
            "on one worker; pass a shard key or allow_global=True"
        )
    ntok = (
        F.col(token_count_col) if isinstance(token_count_col, str) else token_count_col
    )
    base = Window.partitionBy(*partition_cols) if partition_cols else Window.partitionBy()
    w = base.orderBy(F.col(order_col)).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offset = F.coalesce(F.sum(ntok).over(w), F.lit(0)).alias("_tok_offset")
    return df.select("*", offset).withColumn(
        seq_id_col, F.floor(F.col("_tok_offset") / F.lit(float(seq_len))).cast("long")
    )
