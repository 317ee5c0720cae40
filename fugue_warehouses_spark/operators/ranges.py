"""Range join (point-in-interval) — binned equi-join plan.

A naive ``l.t BETWEEN r.start AND r.end`` join has no equality key, so
Spark falls back to BroadcastNestedLoopJoin — O(n*m) and only viable
when one side broadcasts. The binned plan turns it into an equi-join:

- each interval explodes into the fixed-width time bins it overlaps;
- each point maps to exactly one bin;
- equi-join on (by..., bin) then exact containment filter.

Join fan-out is bounded by interval_width/bin_width copies per
interval; each point appears once, so no dedup is needed. Pick
``bin_width`` near the typical interval width: wider bins mean fewer
interval copies but more false candidates for the filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _to_epoch(col: Column) -> Column:
    # works for timestamp/timestamp_ntz and numeric columns alike
    return F.unix_micros(col.cast("timestamp")) / 1_000_000.0


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width_sec: float = 3600.0,
    by: list[str] | None = None,
    end_inclusive: bool = False,
) -> DataFrame:
    """Inner-join each point row to every interval row containing it:
    start <= point < end (or <= end when ``end_inclusive``).

    Output: all point columns + all interval columns (by-columns once).
    """
    by = by or []
    w = float(bin_width_sec)
    p_bin = F.floor(_to_epoch(F.col(point_col)) / w)
    s_bin = F.floor(_to_epoch(F.col(start_col)) / w)
    e_bin = F.floor(_to_epoch(F.col(end_col)) / w)

    binned_points = points.withColumn("__bin", p_bin.cast("long"))
    binned_intervals = intervals.withColumn(
        "__bin", F.explode(F.sequence(s_bin.cast("long"), e_bin.cast("long")))
    )
    cond_end = (
        F.col(point_col) <= F.col(end_col)
        if end_inclusive
        else F.col(point_col) < F.col(end_col)
    )
    return (
        binned_points.join(binned_intervals, on=[*by, "__bin"], how="inner")
        .filter((F.col(start_col) <= F.col(point_col)) & cond_end)
        .drop("__bin")
    )
