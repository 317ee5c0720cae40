"""As-of (most-recent-match) join — an operator Spark lacks natively.

Semantics (backward as-of, the common case): for each left row, attach
the right row with the greatest right-time <= left-time within the same
``by`` key group; left rows with no earlier right row keep nulls.
Matches DuckDB's ``ASOF JOIN`` (used as the test oracle) and the
standard time-series/point-in-time-correctness definition.

Implementation is the union-tag-carry-forward plan, not a theta join:

    union(left-tagged, right-tagged)
      -> window partitionBy(by) orderBy(time, side)
      -> last(right-payload, ignorenulls) carry-forward
      -> keep left rows

One shuffle on the ``by`` key, linear scan within each key — O(n log n)
for the sort vs the O(n*m) of an inequality join, and no range-binning
parameter to tune. At 100 TB the window sort is the same shuffle a
sort-merge join would pay. Right-side ties on (by, time) resolve to the
row latest in the sort (deterministic given a unique right time per
key; add a tiebreaker column to ``right_payload`` if needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_time: str,
    right_time: str,
    right_payload: list[str],
) -> DataFrame:
    """Backward as-of join. Output = all left columns + right_payload
    (null where no right row at-or-before the left time exists).

    ``right_payload`` names must not collide with left columns (other
    than the ``by`` keys) — a collision would silently produce
    ambiguous output, so it raises instead.
    """
    lcols = left.columns
    left_non_key = {c for c in lcols if c not in by}
    clash = left_non_key.intersection(right_payload)
    if clash:
        raise ValueError(
            f"right_payload columns collide with left columns: {sorted(clash)}; "
            "rename them on the right frame before the as-of join"
        )
    reserved = {"__t", "__side"}.intersection(lcols) | {
        c for c in right_payload if c in ("__t", "__side")
    }
    if reserved:
        raise ValueError(f"column names {sorted(reserved)} are reserved here")
    tagged_l = left.select(
        *by,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols if c not in by and c != left_time],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_payload],
    )
    tagged_r = right.select(
        *by,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in by and c != left_time],
        *[F.col(c).alias(f"__r_{c}") for c in right_payload],
    )
    unioned = tagged_l.unionByName(tagged_r)
    # right rows (__side=0) sort before left rows at the same instant,
    # so an exactly-simultaneous right row IS visible to the left row
    # (<= semantics, matching ASOF JOIN)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("__t").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *by,
        "__t",
        "__side",
        *[c for c in lcols if c not in by and c != left_time],
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(c)
            for c in right_payload
        ],
    )
    return carried.filter(F.col("__side") == 1).select(
        *by,
        F.col("__t").alias(left_time),
        *[c for c in lcols if c not in by and c != left_time],
        *right_payload,
    )
