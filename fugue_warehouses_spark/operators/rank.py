"""Distributed exact total-order rank — no SinglePartition window.

``row_number() OVER (ORDER BY ...)`` (and anything built on it:
``ntile``, exact quantile buckets, global dense ranks) is the textbook
scale-killer: Spark plans a partition-less ``WindowExec`` that moves
the ENTIRE relation through one task. The distributed-exact
alternative here keeps the same total order with bounded partitions:

1. ``repartitionByRange`` on the order columns — Spark's range
   partitioner (sampled split points, ascending partition ids) gives
   globally ordered, roughly equal-sized partitions — then
   ``sortWithinPartitions`` (no shuffle, bounded per-task sort);
2. ``monotonically_increasing_id`` over the sorted partitions encodes
   ``partition_index * 2^33 + local_row_index`` — i.e. the partition
   id AND the within-partition row_number in one nondeterministic-
   but-now-pinned column (the frame is lazily localCheckpoint-ed, so
   every later job reads the same materialized ids);
3. per-partition row counts -> collect (#partitions ints — O(cluster),
   not O(data)) -> cumulative offsets on the driver, broadcast back;
   exact global rank = offset[partition] + local_row_index + 1.

Same answer as the global window, hash-for-hash, with ONE data
shuffle total (the range exchange) — the window formulation would add
a second, partition-id hash exchange just to re-cluster rows that are
already partition-clustered. This mirrors the reference's
warehouse-side ``ntile``/``row_number`` surface (the warehouses run
the same distributed-rank trick internally) re-expressed for Spark.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fugue_warehouses_spark.plans.localframe import local_frame


def _range_npart(df: DataFrame, num_partitions: int | None) -> int:
    """Scale-adaptive range-partition count (round 11, guide §2:
    "make partitioning scale-adaptive — derive from input size —
    rather than a constant tuned for either local mode or the
    cluster"). The previous constant (defaultParallelism) was wrong
    at BOTH ends: at bench scale every rank/cumsum paid 32-partition
    exchanges, checkpoints and windows on kilobytes (~6 x 32 tiny
    tasks per facet — pure scheduler floor), and at 100 TB a fixed 32
    would put terabytes in one range partition.

    Derives the count from Catalyst's own size estimate of the input
    plan: ceil(bytes / target) with target =
    $SPARK_GRAFT_RANGE_PARTITION_BYTES (default 64 MB, the same
    advisory granularity AQE coalesces shuffles to), clamped to
    [defaultParallelism, max(defaultParallelism,
    $SPARK_GRAFT_RANGE_PARTITION_CAP)]. The FLOOR is
    defaultParallelism — AQE's parallelism-first rule: a small input
    still spreads its per-partition sort/window compute over every
    core (an npart-from-bytes-only variant was measured in round 11:
    it collapsed sf0.1 inputs to 1 range partition and serialized
    2-4 s of per-doc expression work that 32 partitions run in
    parallel — strictly worse). The CEILING scales with data: at
    100 TB ceil(bytes/64 MB) >> cores, where the previous constant 32
    would have put terabytes in one range partition; the cap default
    is 65536 (round 12 — the flat 4096 meant ~25 GB/partition at
    100 TB, sort-spill territory; 65536 keeps partitions ≈ 1.6 GB
    there, and the env override covers larger corpora — spill math in
    SCALE.md). Absent stats keep the defaultParallelism floor,
    detected EXPLICITLY (round 12, ADVICE r11): a leaf with unknown
    stats reports ``spark.sql.defaultSizeInBytes`` (Long.MaxValue
    unless overridden) and products of it stay >= that value, so the
    placeholder test compares against the session's ACTUAL conf value
    instead of a magnitude cutoff — a genuinely >= 1 PiB input with
    real stats now sizes from its bytes instead of silently falling
    to the floor. Partition count provably cannot change any caller's
    result: every call site orders by a TOTAL order (unique
    tiebreaker) and sums integer value columns, so rank/cumsum values
    are partition-independent (tests/test_rank.py pins equality
    across num_partitions)."""
    if num_partitions is not None:
        return num_partitions
    par = df.sparkSession.sparkContext.defaultParallelism
    target = int(
        os.environ.get("SPARK_GRAFT_RANGE_PARTITION_BYTES", str(64 << 20))
    )
    cap = max(
        par, int(os.environ.get("SPARK_GRAFT_RANGE_PARTITION_CAP", "65536"))
    )
    try:
        nbytes = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        return par
    try:
        placeholder = int(
            df.sparkSession._jsparkSession.sessionState()
            .conf()
            .defaultSizeInBytes()
        )
    except Exception:
        placeholder = (1 << 63) - 1  # SQLConf default: Long.MaxValue
    if nbytes <= 0 or nbytes >= placeholder:
        return par  # absent/default stats (the placeholder itself)
    if placeholder >= (1 << 62) and nbytes >= (1 << 53):
        # derived-from-placeholder: operators above an unknown-stats
        # leaf SCALE the Long.MaxValue placeholder (filter selectivity,
        # column pruning), landing below it but still astronomically
        # large. With the default placeholder, anything >= 8 PiB is a
        # scaled placeholder (>= 1/1024 of Long.MaxValue), not a real
        # input — this engine's at-scale claim is 100 TB. A session
        # that set defaultSizeInBytes to a real value skips this band.
        return par
    need = (nbytes + target - 1) // target
    return int(min(max(par, need), cap))


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

    ``order_by`` takes SORT expressions verbatim, like
    :func:`add_global_cumsum` (``F.desc("q")``, plain strings/columns
    default ascending) — round 12, so rank call sites that order
    descending need no cumsum-of-ones detour (a rank IS a cumsum of
    ones, but this operator computes it from the monotonic-id decode
    with no pid window and no second exchange).

    Cost: ONE range shuffle (the only data movement), a per-partition
    sort, and a #partitions-int collect. The sorted+id'd frame is
    lazily localCheckpoint-ed so the counts pass and the ranked output
    read one materialization — which also pins the (nondeterministic)
    monotonic ids to a single assignment.
    """
    order_cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    npart = _range_npart(df, num_partitions)
    # monotonically_increasing_id = partition_index * 2^33 + row index
    # within the partition's iteration order — which IS the sort order
    # after sortWithinPartitions. Decode both halves instead of paying
    # a second exchange for a partition-id window.
    lo_mask = (1 << 33) - 1
    ranged = (
        df.repartitionByRange(npart, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__mono", F.monotonically_increasing_id())
        .localCheckpoint(eager=False)
    )
    pid = F.shiftrightunsigned(F.col("__mono"), 33).cast("int")
    # one int per partition — O(cluster size), never O(data)
    counts = {
        r["__pid"]: r["c"]
        for r in ranged.groupBy(pid.alias("__pid"))
        .agg(F.count("*").alias("c"))
        .collect()
    }
    offsets, acc = [], 0
    for p in sorted(counts):
        offsets.append((p, acc))
        acc += counts[p]
    spark = df.sparkSession
    # one-slice local frame: the 32-slice default costs a no-op task
    # per slice on every broadcast build (plans/localframe.py)
    off_df = local_frame(spark, offsets or [], "__pid int, __off long")
    ranked = (
        ranged.withColumn("__pid", pid)
        .join(F.broadcast(off_df), "__pid")
        .withColumn(
            rank_col,
            (
                F.col("__mono").bitwiseAND(F.lit(lo_mask))
                + F.col("__off")
                + F.lit(1)
            ).cast("long"),
        )
        .drop("__pid", "__off", "__mono")
    )
    return ranked, acc


def add_global_cumsum(
    df: DataFrame,
    order_by: list[Column],
    value_col: str,
    cumsum_col: str = "global_cumsum",
    num_partitions: int | None = None,
    total_col: str | None = None,
) -> DataFrame:
    """Exact global running sum of ``value_col`` in the total order
    given by ``order_by`` — the distributed replacement for
    ``SUM(v) OVER (ORDER BY ...)``, which Spark plans as a
    partition-less WindowExec (one task swallows the relation). The
    canonical consumer is budget selection: "take documents by
    descending quality until N tokens".

    ``order_by`` takes SORT expressions verbatim (``F.desc("q")``,
    ``F.asc("doc_id")``) — make it a total order with a unique
    tiebreaker, or ties get an arbitrary stable order within their
    range partition. ``value_col`` must be non-null (sum skips nulls,
    which would silently desync the per-partition offsets). The
    cumsum column carries Spark's own SUM result type (long for
    integral input, double/decimal for fractional); integral and
    decimal cumsums are exact, double cumsums associate partial sums
    per partition — same 1-ulp-per-level caveat as any parallel
    floating-point sum.

    Shape: one range exchange orders and balances the relation (ties
    split across partitions by the tiebreaker, so a heavily-tied sort
    key cannot melt one task); per-partition value sums collect to the
    driver (#partitions longs — O(cluster), not O(data)) and prefix
    into offsets; the within-partition running sum is a window
    PARTITIONED BY the range-partition id — bounded per task, never
    global. That window costs one additional hash exchange on the pid
    (Catalyst cannot see that the rows are already pid-clustered);
    two balanced shuffles total, which is the honest price of an
    exact global cumsum without a single-task sort.
    """
    npart = _range_npart(df, num_partitions)
    ranged = (
        df.repartitionByRange(npart, *order_by)
        .sortWithinPartitions(*order_by)
        .withColumn("__mono", F.monotonically_increasing_id())
        .localCheckpoint(eager=False)
    )
    pid = F.shiftrightunsigned(F.col("__mono"), 33).cast("int")
    part_sums = ranged.groupBy(pid.alias("__pid")).agg(
        F.sum(value_col).alias("s")
    )
    # offsets carry Spark's own sum result type (long for integral
    # inputs, double/decimal for fractional) — hard-coding long both
    # rejected float offsets at createDataFrame and silently floored
    # the running sum through a cast (round-9 review)
    sum_type = part_sums.schema["s"].dataType
    sums = {r["__pid"]: r["s"] for r in part_sums.collect()}

    def _as_sum_type(x):
        # the zero seed (and any int offset) must arrive as the sum
        # type's Python analog — createDataFrame's verifier rejects
        # e.g. int 0 for DoubleType
        if isinstance(sum_type, (T.DoubleType, T.FloatType)):
            return float(x)
        if isinstance(sum_type, T.DecimalType):
            from decimal import Decimal

            return x if isinstance(x, Decimal) else Decimal(x)
        return x

    offsets, acc = [], 0
    for p in sorted(sums):
        offsets.append((p, _as_sum_type(acc)))
        acc += sums[p] or 0
    spark = df.sparkSession
    # one-slice local frame: see add_global_rank (plans/localframe.py)
    off_df = local_frame(
        spark,
        offsets or [],
        T.StructType(
            [
                T.StructField("__pid", T.IntegerType()),
                T.StructField("__off", sum_type),
            ]
        ),
    )
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("__pid")
        .orderBy("__mono")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        ranged.withColumn("__pid", pid)
        .join(F.broadcast(off_df), "__pid")
        .withColumn(
            cumsum_col,
            (F.sum(value_col).over(w) + F.col("__off")).cast(sum_type),
        )
        .drop("__pid", "__off", "__mono")
    )
    if total_col is not None:
        # the grand total fell out of the offsets collect — attach it
        # as a LITERAL (consumers like balanced sharding need
        # cumsum/total; a separate scan+aggregate+crossJoin would pay
        # a whole extra pass for a number the driver already holds)
        out = out.withColumn(
            total_col, F.lit(_as_sum_type(acc)).cast(sum_type)
        )
    return out


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
