"""The star loader must be self-sufficient under ANY SparkSession.

The correctness harness builds a vanilla session (no nanosAsLong, host
timezone) — round 1's top defect was the loader relying on the
builder's session factory for the events.parquet TIMESTAMP(NANOS)
quirk. These tests strip the relevant runtime confs from the live
session and assert the loader still produces correct, canonical
(µs, UTC-naive) timestamps.
"""

from __future__ import annotations

import contextlib

from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType

from fugue_warehouses_spark.sources.star import (
    _FRAME_CACHE,
    load_star_table,
    normalize_event_time,
)


@contextlib.contextmanager
def _vanilla_confs(spark, confs):
    """Temporarily set/unset runtime SQL confs, restoring after."""
    saved = {}
    for k, v in confs.items():
        saved[k] = spark.conf.get(k, None)
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, old in saved.items():
            if old is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, old)


def _fresh_events(spark, sf_dir):
    _FRAME_CACHE.pop((spark.sparkContext.applicationId, sf_dir, "events"), None)
    try:
        return load_star_table(spark, sf_dir, "events")
    finally:
        # drop again so other tests re-load under their own conf state
        _FRAME_CACHE.pop((spark.sparkContext.applicationId, sf_dir, "events"), None)


def test_events_reads_without_preconfigured_session(spark, sf_dir):
    with _vanilla_confs(spark, {"spark.sql.legacy.parquet.nanosAsLong": None}):
        ev = _fresh_events(spark, sf_dir)
        assert isinstance(ev.schema["ts"].dataType, TimestampNTZType)
        assert ev.filter(F.col("ts").isNotNull()).limit(1).count() == 1


def test_events_ts_is_timezone_independent(spark, sf_dir):
    with _vanilla_confs(
        spark, {"spark.sql.legacy.parquet.nanosAsLong": None}
    ):
        utc_min = _fresh_events(spark, sf_dir).agg(
            F.min("ts").alias("m")
        ).collect()[0]["m"]
        with _vanilla_confs(
            spark, {"spark.sql.session.timeZone": "America/New_York"}
        ):
            ny_min = _fresh_events(spark, sf_dir).agg(
                F.min("ts").alias("m")
            ).collect()[0]["m"]
    assert utc_min == ny_min


def test_normalize_event_time_epoch_arithmetic(spark):
    df = spark.createDataFrame([(1_700_000_000_123_456_789,)], "ts bigint")
    out = normalize_event_time(df).collect()[0]["ts"]
    assert out.strftime("%Y-%m-%d %H:%M:%S.%f") == "2023-11-14 22:13:20.123456"


def test_queries_timezone_independent(spark, sf_dir):
    """Representative queries must return identical rows under a
    non-UTC session timezone (the harness session's tz is unknown):
    NTZ arithmetic end-to-end, no LTZ literals or casts."""
    from fugue_warehouses_spark.queries import QUERIES

    names = [
        "events_sessionization",
        "q4_priority_late_ships",
        "events_hourly_stats",
        "orders_trailing_90d_avg",
        "events_asof_last_signup",
    ]

    def run_all():
        return {
            n: sorted([tuple(r) for r in QUERIES[n](spark, sf_dir).collect()], key=repr)
            for n in names
        }

    utc = run_all()
    with _vanilla_confs(spark, {"spark.sql.session.timeZone": "America/New_York"}):
        ny = run_all()
    assert utc == ny
