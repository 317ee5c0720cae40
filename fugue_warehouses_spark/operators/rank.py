"""Distributed exact total-order rank — no SinglePartition window.

``row_number() OVER (ORDER BY ...)`` (and anything built on it:
``ntile``, exact quantile buckets, global dense ranks) is the textbook
scale-killer: Spark plans a partition-less ``WindowExec`` that moves
the ENTIRE relation through one task. The distributed-exact
alternative here keeps the same total order with bounded partitions:

1. ``repartitionByRange`` on the order columns — Spark's range
   partitioner (sampled split points, ascending partition ids) gives
   globally ordered, roughly equal-sized partitions;
2. per-partition row counts -> collect (#partitions ints — O(cluster),
   not O(data)) -> cumulative offsets on the driver;
3. ``row_number`` windowed WITHIN each physical partition (bounded
   memory, fully parallel) + the partition's offset = exact global
   rank.

Same answer as the global window, hash-for-hash; the only driver-side
state is one integer per partition. This mirrors the reference's
warehouse-side ``ntile``/``row_number`` surface (the warehouses run
the same distributed-rank trick internally) re-expressed for Spark.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def add_global_rank(
    df: DataFrame,
    order_by: list[str | Column],
    rank_col: str = "global_rank",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Return ``(df + rank_col, total_row_count)`` where ``rank_col``
    is the exact 1-based ``row_number`` of the row in the total order
    given by ``order_by`` (make it a total order — add a unique
    tiebreaker column — or equal rows get an arbitrary stable order
    within their range partition).

    Cost: one range shuffle + one pid-hash shuffle for the
    within-partition window (each moves ~1/P of the data per task) +
    a #partitions-int collect. The ranged frame is lazily
    localCheckpoint-ed so the counts pass and the ranked output share
    one materialization of the range shuffle.
    """
    order_cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    npart = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(npart, *[c.asc() for c in order_cols])
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    # one int per partition — O(cluster size), never O(data)
    counts = {
        r["__pid"]: r["c"]
        for r in ranged.groupBy("__pid").agg(F.count("*").alias("c")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    spark = df.sparkSession
    if offsets:
        off_df = spark.createDataFrame(offsets, "__pid int, __off long")
    else:
        off_df = spark.createDataFrame([], "__pid int, __off long")
    w = Window.partitionBy("__pid").orderBy(*[c.asc() for c in order_cols])
    ranked = (
        ranged.join(F.broadcast(off_df), "__pid")
        .withColumn(
            rank_col, (F.row_number().over(w) + F.col("__off")).cast("long")
        )
        .drop("__pid", "__off")
    )
    return ranked, acc


def ntile_from_rank(rank: Column, n: int, k: int) -> Column:
    """Exact SQL ``ntile(k)`` bucket from a 1-based global rank over
    ``n`` total rows, as a constant-folded expression (no window): the
    first ``n % k`` buckets take ``n//k + 1`` rows, the rest ``n//k``
    — the ANSI front-loaded-remainder rule DuckDB/Spark both follow.
    """
    q, rem = divmod(n, k)
    if q == 0:
        # fewer rows than buckets: ntile gives row r bucket r
        return rank.cast("int")
    head = rem * (q + 1)  # rows living in the (q+1)-sized buckets
    return (
        F.when(rank <= head, F.ceil(rank / F.lit(q + 1)))
        .otherwise(rem + F.ceil((rank - head) / F.lit(q)))
        .cast("int")
    )
