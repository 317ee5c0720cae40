"""Table-history operators: snapshot diff, SCD Type 2, changelog compaction.

The reference's warehouses get these from their SQL surface (MERGE /
window functions — SURVEY.md §2.C); here they are first-class
composable operators over Spark DataFrames:

- ``snapshot_diff``   — compare two versions of a keyed table and
  classify every key as added / removed / changed / unchanged (the
  core of CDC reconciliation and data-regression testing).
- ``scd2_intervals``  — collapse an observation log into Slowly
  Changing Dimension Type-2 validity intervals (valid_from /
  valid_to / is_current) per key.
- ``latest_state``    — last-write-wins changelog compaction: one row
  per key, the most recent by an explicit total order.

Scale notes (100 TB stance): each operator is a single hash shuffle on
the key columns (full outer join for the diff, window partitions for
SCD2/compaction); no driver-side state, no collects. Skewed keys fall
to AQE skew-join / the salting helpers in operators/skew.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Row-level diff of two table snapshots sharing a key.

    Returns one row per key present in either side with columns
    ``<keys>``, ``change_type`` (added/removed/changed/unchanged) and,
    for every compared column ``c``, ``old_<c>`` / ``new_<c>``.
    ``added`` = key only in ``new``; ``removed`` = only in ``old``;
    ``changed`` = present in both with any compared column differing
    under null-safe equality.

    One shuffle: a full outer join on ``keys``.
    """
    if compare_cols is None:
        compare_cols = [c for c in old.columns if c not in keys]
        missing = [c for c in compare_cols if c not in new.columns]
        if missing:
            raise ValueError(f"compare columns absent from new side: {missing}")
    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in keys],
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
        F.lit(True).alias("__o_present"),
    )
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}") for k in keys],
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
        F.lit(True).alias("__n_present"),
    )
    # null-safe key equality + explicit presence markers: a NULL natural
    # key must match its counterpart across snapshots and must not be
    # misread as "absent" (key.isNotNull() would misclassify it)
    cond = None
    for k in keys:
        e = F.col(f"__ok_{k}").eqNullSafe(F.col(f"__nk_{k}"))
        cond = e if cond is None else cond & e
    j = o.join(n, cond, "full_outer")
    in_old = F.col("__o_present").isNotNull()
    in_new = F.col("__n_present").isNotNull()
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    change = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(
        *[
            F.coalesce(F.col(f"__nk_{k}"), F.col(f"__ok_{k}")).alias(k)
            for k in keys
        ],
        change.alias("change_type"),
        *[F.col(f"old_{c}") for c in compare_cols],
        *[F.col(f"new_{c}") for c in compare_cols],
    )


def scd2_intervals(
    df: DataFrame,
    keys: Sequence[str],
    state_col: str,
    ts_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Slowly-Changing-Dimension Type 2 build from an observation log.

    Consecutive observations of the same ``state_col`` value (ordered
    by ``ts_col`` then ``tiebreak_cols`` within each key) collapse into
    one validity interval. Output per (key, run):
    ``<keys>, <state_col>, valid_from, valid_to, n_obs, is_current``
    where ``valid_to`` is the next interval's ``valid_from`` (NULL for
    the current interval, matching the open-ended SCD2 convention).

    Two window passes over the same (keys)-partitioned sort — one
    shuffle; the run groupBy reuses the partitioning.
    """
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak_cols]
    w = Window.partitionBy(*keys).orderBy(*order)
    changed = F.when(
        F.lag(state_col).over(w).eqNullSafe(F.col(state_col)), F.lit(0)
    ).otherwise(F.lit(1))
    runs = df.withColumn(
        "__run",
        F.sum(changed).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    grouped = runs.groupBy(*keys, "__run").agg(
        # state is constant within a run by construction; min() keeps the
        # aggregate deterministic (first() is order-dependent in general)
        F.min(state_col).alias(state_col),
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    w2 = Window.partitionBy(*keys).orderBy(F.col("__run").asc())
    return (
        grouped.withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(
            *keys, state_col, "valid_from", "valid_to", "n_obs", "is_current"
        )
    )


def latest_state(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
) -> DataFrame:
    """Last-write-wins changelog compaction: the single most recent row
    per key, "most recent" = greatest ``order_cols`` tuple (compared
    in order, descending). The order must be total per key for a
    deterministic result — include a unique tiebreaker column.

    One shuffle (window partition); Spark plans a partial
    WindowGroupLimit before the exchange, so each map task forwards
    one candidate row per key it sees, not its whole partition.
    """
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
