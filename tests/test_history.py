"""Table-history operators (operators/history.py): snapshot diff,
SCD Type 2 intervals, last-write-wins compaction, plus the
time-weighted average (operators/timeseries.py) — hand-checked
fixtures and edge cases; the registry queries are oracle-mirrored in
test_oracle_parity.py."""

from __future__ import annotations

import datetime as dt

import pytest

from fugue_warehouses_spark.operators.history import (
    latest_state,
    scd2_intervals,
    snapshot_diff,
)
from fugue_warehouses_spark.operators.timeseries import time_weighted_avg


def _ts(s):
    return dt.datetime.fromisoformat(s)


# ---------------------------------------------------------------- diff


def test_snapshot_diff_classifies(spark):
    old = spark.createDataFrame(
        [(1, 10.0, "x"), (2, 20.0, "y"), (3, 30.0, "z")],
        "k long, price double, tag string",
    )
    new = spark.createDataFrame(
        [(2, 20.0, "y"), (3, 31.0, "z"), (4, 40.0, "w")],
        "k long, price double, tag string",
    )
    got = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(old, new, ["k"]).collect()
    }
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_snapshot_diff_null_safe_compare(spark):
    old = spark.createDataFrame(
        [(1, None), (2, None)], "k long, v string"
    )
    new = spark.createDataFrame(
        [(1, None), (2, "set")], "k long, v string"
    )
    got = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(old, new, ["k"]).collect()
    }
    assert got == {1: "unchanged", 2: "changed"}


def test_snapshot_diff_carries_old_new_values(spark):
    old = spark.createDataFrame([(1, 10.0)], "k long, v double")
    new = spark.createDataFrame([(1, 11.0)], "k long, v double")
    row = snapshot_diff(old, new, ["k"]).collect()[0]
    assert (row["old_v"], row["new_v"]) == (10.0, 11.0)


def test_snapshot_diff_empty_old_side(spark):
    old = spark.createDataFrame([], "k long, v double")
    new = spark.createDataFrame([(1, 1.0)], "k long, v double")
    rows = snapshot_diff(old, new, ["k"]).collect()
    assert [(r["k"], r["change_type"]) for r in rows] == [(1, "added")]


def test_snapshot_diff_missing_compare_col_raises(spark):
    old = spark.createDataFrame([(1, 1.0)], "k long, v double")
    new = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="absent from new side"):
        snapshot_diff(old, new, ["k"])


# ---------------------------------------------------------------- scd2


def test_scd2_collapses_runs(spark):
    obs = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:00"), "bronze"),
            (1, _ts("2024-01-02 00:00:00"), "bronze"),
            (1, _ts("2024-01-03 00:00:00"), "gold"),
            (1, _ts("2024-01-04 00:00:00"), "bronze"),  # back again: new run
            (2, _ts("2024-01-01 00:00:00"), "silver"),
        ],
        "k long, t timestamp_ntz, state string",
    )
    out = scd2_intervals(obs, ["k"], "state", "t").collect()
    by_key = {}
    for r in sorted(out, key=lambda r: (r["k"], r["valid_from"])):
        by_key.setdefault(r["k"], []).append(
            (r["state"], r["n_obs"], r["is_current"], r["valid_to"])
        )
    assert by_key[1] == [
        ("bronze", 2, False, _ts("2024-01-03 00:00:00")),
        ("gold", 1, False, _ts("2024-01-04 00:00:00")),
        ("bronze", 1, True, None),
    ]
    assert by_key[2] == [("silver", 1, True, None)]


def test_scd2_intervals_tile_the_timeline(spark, sf_dir):
    """Per key: exactly one current row, and every valid_to equals the
    next interval's valid_from (no gaps, no overlaps)."""
    from fugue_warehouses_spark.sources import load_star_table

    ev = load_star_table(spark, sf_dir, "events").filter("user_id < 10")
    rows = scd2_intervals(
        ev, ["user_id"], "event_type", "ts", ("event_id",)
    ).collect()
    by_key = {}
    for r in sorted(rows, key=lambda r: (r["user_id"], r["valid_from"])):
        by_key.setdefault(r["user_id"], []).append(r)
    for k, ivs in by_key.items():
        assert sum(1 for r in ivs if r["is_current"]) == 1
        assert ivs[-1]["is_current"] and ivs[-1]["valid_to"] is None
        for a, b in zip(ivs, ivs[1:]):
            assert a["valid_to"] == b["valid_from"], f"gap at key {k}"
            assert a["event_type"] != b["event_type"], f"uncollapsed run at key {k}"


def test_scd2_null_state_runs(spark):
    obs = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:00"), None),
            (1, _ts("2024-01-02 00:00:00"), None),
            (1, _ts("2024-01-03 00:00:00"), "a"),
        ],
        "k long, t timestamp_ntz, state string",
    )
    out = sorted(
        scd2_intervals(obs, ["k"], "state", "t").collect(),
        key=lambda r: r["valid_from"],
    )
    assert [(r["state"], r["n_obs"]) for r in out] == [(None, 2), ("a", 1)]


# ------------------------------------------------------------- compaction


def test_latest_state_picks_max_order(spark):
    log = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:00"), 1, "old"),
            (1, _ts("2024-01-02 00:00:00"), 2, "new"),
            (1, _ts("2024-01-02 00:00:00"), 3, "tie-winner"),  # same ts
            (2, _ts("2024-01-01 00:00:00"), 4, "only"),
        ],
        "k long, t timestamp_ntz, seq long, payload string",
    )
    got = {
        r["k"]: r["payload"]
        for r in latest_state(log, ["k"], ["t", "seq"]).collect()
    }
    assert got == {1: "tie-winner", 2: "only"}


def test_latest_state_single_shuffle_with_group_limit(spark, sf_dir):
    from fugue_warehouses_spark.sources import load_star_table

    ev = load_star_table(spark, sf_dir, "events")
    plan = latest_state(
        ev, ["user_id"], ["ts", "event_id"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan  # partial per-map-task top-1
    assert plan.count("Exchange hashpartitioning") <= 1


# ------------------------------------------------------------------ twa


def test_time_weighted_avg_hand_computed(spark):
    # value 10 held 30s, value 20 held 10s -> twa = (300+200)/40 = 12.5
    obs = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:00"), 10.0),
            (1, _ts("2024-01-01 00:00:30"), 20.0),
            (1, _ts("2024-01-01 00:00:40"), 99.0),  # last: no weight
        ],
        "k long, t timestamp_ntz, v double",
    )
    row = time_weighted_avg(obs, "k", "t", "v").collect()[0]
    assert row["n_events"] == 3
    assert row["twa"] == pytest.approx(12.5)


def test_time_weighted_avg_single_obs_null(spark):
    obs = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:00:00"), 10.0)],
        "k long, t timestamp_ntz, v double",
    )
    row = time_weighted_avg(obs, "k", "t", "v").collect()[0]
    assert row["n_events"] == 1 and row["twa"] is None


def test_snapshot_diff_null_key_rows(spark):
    from fugue_warehouses_spark.operators.history import snapshot_diff

    old = spark.createDataFrame([(1, "a"), (None, "x")], "k int, v string")
    new = spark.createDataFrame([(1, "a"), (None, "x2")], "k int, v string")
    out = {
        (r["k"], r["change_type"]): (r["old_v"], r["new_v"])
        for r in snapshot_diff(old, new, ["k"]).collect()
    }
    # NULL key matches NULL key (null-safe join) and is compared, not
    # misclassified as added/removed
    assert out == {
        (1, "unchanged"): ("a", "a"),
        (None, "changed"): ("x", "x2"),
    }


def test_snapshot_diff_null_key_removed(spark):
    from fugue_warehouses_spark.operators.history import snapshot_diff

    old = spark.createDataFrame([(None, "gone")], "k int, v string")
    new = spark.createDataFrame([(2, "b")], "k int, v string")
    out = {
        (r["k"], r["change_type"]) for r in snapshot_diff(old, new, ["k"]).collect()
    }
    assert out == {(None, "removed"), (2, "added")}
