"""Constraint validation rules (operators/validation.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fugue_warehouses_spark.operators import validation as V


def _child(spark):
    return spark.createDataFrame(
        [
            (1, 10, "A", 5.0),
            (2, 10, "A", -1.0),   # range violation
            (3, None, "B", 2.0),  # null fk key: exempt from FK, not_null hit
            (4, 99, "Z", 3.0),    # orphan fk + bad status
            (4, 11, "A", 4.0),    # duplicate id
        ],
        "id long, parent_id long, status string, amount double",
    )


def _parent(spark):
    return spark.createDataFrame([(10,), (11,)], "pk long")


def _run(spark):
    rules = [
        V.unique("id_unique", "id"),
        V.not_null("parent_set", "parent_id"),
        V.in_range("amount_range", "amount", 0, 100),
        V.accepted("status_ok", "status", "A", "B"),
        V.foreign_key("parent_fk", ("parent_id",), _parent(spark), ("pk",)),
    ]
    return {r["rule"]: r["violations"] for r in V.validate(_child(spark), rules).collect()}


def test_rule_counts(spark):
    got = _run(spark)
    assert got == {
        "id_unique": 1,      # one extra row under id=4
        "parent_set": 1,     # the NULL parent_id
        "amount_range": 1,   # -1.0
        "status_ok": 1,      # "Z"
        "parent_fk": 1,      # 99 has no parent; NULL key exempt
    }


def test_clean_frame_all_zero(spark):
    df = spark.createDataFrame([(1, 10)], "id long, parent_id long")
    out = V.validate(
        df,
        [V.unique("u", "id"), V.not_null("n", "parent_id"),
         V.foreign_key("f", ("parent_id",), _parent(spark), ("pk",))],
    )
    assert all(r["violations"] == 0 for r in out.collect())


def test_scan_rules_share_one_aggregate(spark):
    """N scan-only rules must compile to a single pass over the frame."""
    df = _child(spark)
    out = V.validate(
        df,
        [V.not_null("a", "parent_id"), V.in_range("b", "amount", 0, 9),
         V.accepted("c", "status", "A")],
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") == 1  # the frame is scanned once


def test_validate_rejects_bad_input(spark):
    df = _child(spark)
    with pytest.raises(ValueError, match="unique"):
        V.validate(df, [V.not_null("x", "id"), V.unique("x", "id")])
    with pytest.raises(ValueError, match="no rules"):
        V.validate(df, [])
    with pytest.raises(ValueError, match="align"):
        V.foreign_key("f", ("a", "b"), _parent(spark), ("pk",))


def test_multi_col_fk_null_exemption(spark):
    child = spark.createDataFrame(
        [(1, 1, "x"), (None, 2, "y"), (9, 9, "z")],
        "k1 long, k2 long, v string",
    )
    parent = spark.createDataFrame([(1, 1)], "p1 long, p2 long")
    out = V.validate(
        child, [V.foreign_key("fk", ("k1", "k2"), parent, ("p1", "p2"))]
    ).collect()
    # (None,2) exempt (MATCH SIMPLE); (9,9) is the only orphan
    assert out[0]["violations"] == 1


def test_profile_table_stats(spark):
    from fugue_warehouses_spark.operators.validation import profile_table

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None), (2, None, 3.5)],
        "k long, s string, v double",
    )
    prof = {r["column"]: r for r in profile_table(df).collect()}
    assert prof["k"]["n_rows"] == 3 and prof["k"]["n_null"] == 0
    assert prof["k"]["n_distinct"] == 2
    assert prof["k"]["min_num"] == 1.0 and prof["k"]["max_num"] == 2.0
    assert prof["s"]["n_null"] == 1 and prof["s"]["min_str"] == "a"
    assert prof["s"]["min_num"] is None, "strings use the _str slots"
    assert prof["v"]["n_null"] == 1 and prof["v"]["max_num"] == 3.5
    assert prof["v"]["dtype"] == "double"


def test_profile_table_is_lazy_and_rejects_empty(spark):
    import pytest

    from fugue_warehouses_spark.operators.validation import profile_table

    df = spark.createDataFrame([(1, "a")], "k long, s string")
    # plan construction must run NO job (lazy all the way to an action)
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    prof = profile_table(df)
    assert tracker.getJobIdsForGroup(None) == before, "no job at build time"
    assert prof.count() == 2
    with pytest.raises(ValueError, match="non-empty"):
        profile_table(df, columns=[])
