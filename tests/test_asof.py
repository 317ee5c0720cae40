"""as-of join semantics on a hand-checked fixture."""

from __future__ import annotations

import datetime as dt

from fugue_warehouses_spark.operators.asof import asof_join_backward


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_backward_basic(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "a"),
            (1, _ts("2024-01-01 12:00:00"), "b"),
            (2, _ts("2024-01-01 09:00:00"), "c"),  # before any right row
            (3, _ts("2024-01-01 09:00:00"), "d"),  # key with no right rows
        ],
        "k long, t timestamp_ntz, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:30:00"), 10.0),
            (1, _ts("2024-01-01 11:00:00"), 20.0),
            (1, _ts("2024-01-01 13:00:00"), 30.0),  # after every left row
            (2, _ts("2024-01-01 09:00:00"), 40.0),  # simultaneous -> matches
        ],
        "k long, rt timestamp_ntz, price double",
    )
    out = asof_join_backward(
        left, right, by=["k"], left_time="t", right_time="rt",
        right_payload=["price"],
    )
    got = {(r["k"], r["tag"]): r["price"] for r in out.collect()}
    assert got == {
        (1, "a"): 10.0,   # 09:30 is latest <= 10:00
        (1, "b"): 20.0,   # 11:00 is latest <= 12:00
        (2, "c"): 40.0,   # exactly simultaneous counts (<=)
        (3, "d"): None,   # no right rows for key
    }
    assert out.count() == left.count()  # left-join cardinality


def test_asof_preserves_left_columns(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "x", 5)],
        "k long, t timestamp_ntz, s string, extra long",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:00:00"), 1.5)],
        "k long, rt timestamp_ntz, v double",
    )
    out = asof_join_backward(left, right, ["k"], "t", "rt", ["v"])
    assert set(out.columns) == {"k", "t", "s", "extra", "v"}
    row = out.collect()[0]
    assert row["extra"] == 5 and row["v"] == 1.5


def test_asof_rejects_payload_collision(spark):
    import pytest

    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 1.0)], "k long, t timestamp_ntz, v double"
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:00:00"), 2.0)], "k long, rt timestamp_ntz, v double"
    )
    with pytest.raises(ValueError, match="collide"):
        asof_join_backward(left, right, ["k"], "t", "rt", ["v"])
