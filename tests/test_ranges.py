"""Binned range join vs the naive inequality join (ground truth)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from fugue_warehouses_spark.operators.ranges import range_join_binned


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _fixture(spark):
    points = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:30:00")),
            (2, _ts("2024-01-01 11:00:00")),  # boundary: == start of w2
            (3, _ts("2024-01-01 12:00:00")),  # boundary: == end of w2
            (4, _ts("2024-01-05 00:00:00")),  # in no window
        ],
        "pid long, t timestamp_ntz",
    )
    intervals = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00")),
            (20, _ts("2024-01-01 11:00:00"), _ts("2024-01-01 12:00:00")),
            (30, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 13:00:00")),  # overlaps
        ],
        "wid long, s timestamp_ntz, e timestamp_ntz",
    )
    return points, intervals


def test_range_join_matches_naive(spark):
    points, intervals = _fixture(spark)
    got = {
        (r["pid"], r["wid"])
        for r in range_join_binned(
            points, intervals, "t", "s", "e", bin_width_sec=1800
        ).collect()
    }
    naive = {
        (r["pid"], r["wid"])
        for r in points.join(
            intervals, (F.col("s") <= F.col("t")) & (F.col("t") < F.col("e"))
        ).collect()
    }
    assert got == naive
    assert got == {(1, 10), (1, 30), (2, 20), (2, 30), (3, 30)}


def test_range_join_end_inclusive_and_bin_widths(spark):
    points, intervals = _fixture(spark)
    for width in (60, 3600, 86400):  # results independent of bin width
        got = {
            (r["pid"], r["wid"])
            for r in range_join_binned(
                points, intervals, "t", "s", "e",
                bin_width_sec=width, end_inclusive=True,
            ).collect()
        }
        assert got == {(1, 10), (1, 30), (2, 10), (2, 20), (2, 30), (3, 20), (3, 30)}
