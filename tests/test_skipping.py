"""Zone-map file pruning (sources/skipping.py) and the versioned
table store (plans/versioned.py)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from fugue_warehouses_spark.plans import versioned as V
from fugue_warehouses_spark.sources import skipping as SK
from fugue_warehouses_spark.sources import load_star_table


@pytest.fixture(scope="module")
def clustered_orders(spark, sf_dir, tmp_path_factory):
    """Orders laid out date-clustered across 8 files (the layout
    compact+z-order produce) — the shape zone maps exist to exploit."""
    path = str(tmp_path_factory.mktemp("zm") / "orders_by_date")
    orders = load_star_table(spark, sf_dir, "orders")
    (
        orders.repartitionByRange(8, "o_orderdate")
        .sortWithinPartitions("o_orderdate")
        .write.mode("overwrite")
        .parquet(path)
    )
    return path


def test_zone_map_covers_all_files(spark, clustered_orders):
    zm = SK.build_zone_map(clustered_orders, ["o_orderdate", "o_totalprice"])
    files = [f for f in os.listdir(clustered_orders) if f.endswith(".parquet")]
    assert len(zm) == len(files) == 8
    for e in zm:
        assert e["o_orderdate_min"] <= e["o_orderdate_max"]
        assert e["n_rows"] > 0


def test_prune_files_skips_nonoverlapping(spark, clustered_orders):
    zm = SK.build_zone_map(clustered_orders, ["o_orderdate"])
    import datetime as dt

    lo, hi = dt.datetime(1996, 1, 1), dt.datetime(1996, 3, 1)
    kept = SK.prune_files(zm, "o_orderdate", lo, hi)
    assert 0 < len(kept) < 8, "a narrow range must prune most files"


def test_read_pruned_exact_vs_full_scan(spark, clustered_orders):
    import datetime as dt

    lo, hi = dt.datetime(1996, 1, 1), dt.datetime(1996, 3, 1)
    pruned = SK.read_pruned(spark, clustered_orders, "o_orderdate", lo, hi)
    full = spark.read.parquet(clustered_orders).filter(
        (F.col("o_orderdate") >= F.lit(lo)) & (F.col("o_orderdate") <= F.lit(hi))
    )
    got = pruned.agg(
        F.count(F.lit(1)), F.sum("o_orderkey"), F.round(F.sum("o_totalprice"), 2)
    ).collect()[0]
    want = full.agg(
        F.count(F.lit(1)), F.sum("o_orderkey"), F.round(F.sum("o_totalprice"), 2)
    ).collect()[0]
    assert tuple(got) == tuple(want)
    # and the plan really reads fewer files
    assert len(pruned.inputFiles()) < len(full.inputFiles())


def test_read_pruned_empty_range(spark, clustered_orders):
    import datetime as dt

    out = SK.read_pruned(
        spark, clustered_orders, "o_orderdate",
        dt.datetime(2050, 1, 1), dt.datetime(2051, 1, 1),
    )
    assert out.count() == 0
    assert "o_orderkey" in out.columns  # typed empty frame


def test_distributed_builder_matches_driver(spark, clustered_orders):
    a = SK.build_zone_map(clustered_orders, ["o_orderdate", "o_orderkey"])
    b = SK.build_zone_map_distributed(
        spark, clustered_orders, ["o_orderdate", "o_orderkey"]
    )
    assert a == b


def test_string_column_rejected(clustered_orders):
    with pytest.raises(TypeError, match="exact-stats"):
        SK.build_zone_map(clustered_orders, ["o_orderstatus"])


def test_prune_keeps_statless_files():
    zm = [
        {"file": "a", "x_min": 1, "x_max": 5},
        {"file": "b", "x_min": None, "x_max": None},  # no stats
        {"file": "c", "x_min": 10, "x_max": 20},
    ]
    assert SK.prune_files(zm, "x", 6, 8) == ["b"]
    assert SK.prune_files(zm, "x", None, 3) == ["a", "b"]
    assert SK.prune_files(zm, "x", 15, None) == ["b", "c"]


# ------------------------------------------------------- versioned store


def test_versioned_write_read_time_travel(spark, tmp_path):
    store = str(tmp_path / "vstore")
    df1 = spark.range(10).withColumn("tag", F.lit("v1"))
    df2 = spark.range(20).withColumn("tag", F.lit("v2"))
    assert V.write_version(df1, store) == 1
    assert V.write_version(df2, store) == 2
    assert V.list_versions(spark, store) == [1, 2]
    assert V.read_version(spark, store).count() == 20  # latest
    pinned = V.read_version(spark, store, 1)
    assert pinned.count() == 10
    assert pinned.select("tag").distinct().collect()[0][0] == "v1"


def test_versioned_crashed_writer_invisible(spark, tmp_path):
    store = str(tmp_path / "vstore2")
    V.write_version(spark.range(5), store)
    # simulate a crash: stage dir with data but never renamed/completed
    spark.range(3).write.parquet(f"{store}/__stage_deadbeef")
    # and a half-written version dir without _SUCCESS
    os.makedirs(f"{store}/v_00009")
    assert V.list_versions(spark, store) == [1]
    assert V.read_version(spark, store).count() == 5
    with pytest.raises(FileNotFoundError, match="incomplete"):
        V.read_version(spark, store, 9)


def test_versioned_vacuum(spark, tmp_path):
    store = str(tmp_path / "vstore3")
    for i in range(4):
        V.write_version(spark.range(i + 1), store)
    spark.range(1).write.parquet(f"{store}/__stage_leftover")
    # default TTL (24h) protects a possibly-in-flight writer's stage
    removed = V.vacuum(spark, store, keep_last=2)
    assert removed == [1, 2]
    assert V.list_versions(spark, store) == [3, 4]
    assert [
        d for d in os.listdir(store) if d.startswith("__stage_")
    ], "fresh stage survives default vacuum (in-flight writer safety)"
    # forced sweep (stage_ttl_s=0) removes leftovers
    V.vacuum(spark, store, keep_last=2, stage_ttl_s=0)
    assert not [
        d for d in os.listdir(store) if d.startswith("__stage_")
    ], "stage leftovers swept when forced"
    assert V.read_version(spark, store).count() == 4


def test_versioned_empty_store_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError, match="no complete versions"):
        V.read_version(spark, str(tmp_path / "nope"))


def test_versioned_read_all_versions_delta_log(spark, tmp_path):
    """read_all_versions unions every complete version (the append-only
    delta-log reading mode used by the streaming near-dedup index)."""
    store = str(tmp_path / "deltas")
    with pytest.raises(FileNotFoundError, match="no complete versions"):
        V.read_all_versions(spark, store)
    V.write_version(spark.range(0, 3).withColumn("b", F.lit(1)), store)
    V.write_version(spark.range(3, 5).withColumn("b", F.lit(2)), store)
    V.write_version(spark.range(5, 9).withColumn("b", F.lit(3)), store)
    out = V.read_all_versions(spark, store)
    assert sorted(r["id"] for r in out.collect()) == list(range(9))
    # an incomplete version dir is excluded, like read_version
    os.makedirs(f"{store}/v_00007")
    assert V.read_all_versions(spark, store).count() == 9


def test_versioned_compact_folds_deltas(spark, tmp_path):
    """compact_versions folds N delta versions into ONE with identical
    content; listing cost returns to a single directory."""
    store = str(tmp_path / "compact1")
    for i in range(10):
        V.write_version(
            spark.range(i * 3, i * 3 + 3).withColumn("b", F.lit(i)), store
        )
    before = sorted(
        tuple(r) for r in V.read_all_versions(spark, store).collect()
    )
    new_v = V.compact_versions(spark, store)
    assert new_v == 11
    assert V.list_versions(spark, store) == [11]
    after = sorted(
        tuple(r) for r in V.read_all_versions(spark, store).collect()
    )
    assert after == before
    # already-compact store: nothing to fold
    assert V.compact_versions(spark, store) is None
    # deltas written after compaction stay live alongside it
    V.write_version(spark.range(100, 102).withColumn("b", F.lit(99)), store)
    assert V.read_all_versions(spark, store).count() == 32


def test_versioned_compact_crash_window_no_double_count(spark, tmp_path):
    """The crash window between the compacted commit and the old-dir
    sweep must never double-count: the _COMPACTS marker makes readers
    skip subsumed versions even while their directories still exist,
    and a later compact() sweeps them as garbage."""
    store = str(tmp_path / "compact2")
    for i in range(4):
        V.write_version(spark.range(i * 2, i * 2 + 2), store)
    # sweep=False simulates a crash right after the atomic commit
    V.compact_versions(spark, store, sweep=False)
    assert set(V.list_versions(spark, store)) == {1, 2, 3, 4, 5}
    out = V.read_all_versions(spark, store)
    assert sorted(r["id"] for r in out.collect()) == list(range(8))
    # recovery path: the next compact sweeps the dead directories
    assert V.compact_versions(spark, store) is None  # nothing to fold
    assert V.list_versions(spark, store) == [5]
    assert V.read_all_versions(spark, store).count() == 8


def test_versioned_vacuum_refuses_compacted_delta_log(spark, tmp_path):
    """vacuum on a compacted delta-log store would drop folded data —
    must raise, pointing at compact_versions."""
    store = str(tmp_path / "compact5")
    for i in range(3):
        V.write_version(spark.range(i, i + 1), store)
    V.compact_versions(spark, store)
    V.write_version(spark.range(50, 51), store)
    with pytest.raises(ValueError, match="compact_versions"):
        V.vacuum(spark, store, keep_last=1)
    # data untouched
    assert V.read_all_versions(spark, store).count() == 4


def test_versioned_double_compaction_crash_window(spark, tmp_path):
    """Two compactions, both with unswept garbage: the OLDER compacted
    version is itself subsumed by the newer one's marker and must die
    with the deltas it folded — reviving it would double-count."""
    store = str(tmp_path / "compact4")
    for i in range(3):
        V.write_version(spark.range(i * 2, i * 2 + 2), store)  # v1-3
    V.compact_versions(spark, store, sweep=False)  # v4 = fold(1-3)
    V.write_version(spark.range(100, 102), store)  # v5
    V.compact_versions(spark, store, sweep=False)  # v6 = fold(4,5)
    out = sorted(r["id"] for r in V.read_all_versions(spark, store).collect())
    assert out == list(range(6)) + [100, 101]  # each row exactly once
    # recovery sweep removes all five dead directories
    V.compact_versions(spark, store)
    assert V.list_versions(spark, store) == [6]


def test_versioned_compact_concurrent_delta_stays_live(spark, tmp_path):
    """A delta that commits while (or right after) compaction runs takes
    a version number above the _COMPACTS marker, so it must stay live —
    compaction can never swallow data it didn't fold."""
    store = str(tmp_path / "compact3")
    for i in range(3):
        V.write_version(spark.range(i * 2, i * 2 + 2), store)
    V.compact_versions(spark, store, sweep=False)  # folds 1-3 into 4
    # concurrent writer lands AFTER the compacted commit
    V.write_version(spark.range(100, 103), store)  # v5
    out = sorted(r["id"] for r in V.read_all_versions(spark, store).collect())
    assert out == list(range(6)) + [100, 101, 102]
    # a later compact folds {compacted v4, live v5} and sweeps garbage
    V.compact_versions(spark, store)
    assert len(V.list_versions(spark, store)) == 1
    out2 = sorted(r["id"] for r in V.read_all_versions(spark, store).collect())
    assert out2 == out


def test_versioned_upsert(spark, tmp_path):
    store = str(tmp_path / "vstore4")
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "k long, tag string, v double"
    )
    updates = spark.createDataFrame(
        [(2, "b2", 21.0), (3, "c", 30.0)], "k long, tag string, v double"
    )
    assert V.upsert_version(spark, store, base, ["k"]) == 1
    assert V.upsert_version(spark, store, updates, ["k"]) == 2
    latest = {
        r["k"]: (r["tag"], r["v"])
        for r in V.read_version(spark, store).collect()
    }
    assert latest == {1: ("a", 10.0), 2: ("b2", 21.0), 3: ("c", 30.0)}
    # snapshot isolation: v1 unchanged
    v1 = {r["k"]: r["tag"] for r in V.read_version(spark, store, 1).collect()}
    assert v1 == {1: "a", 2: "b"}


def test_distributed_zone_map_first_file_without_stats(spark, tmp_path):
    """Type restore must key off the arrow schema, not the first file's
    stat values: a first file whose indexed column is all-NULL (no
    min/max stats) must not leave other files' bounds stringly-typed."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "zm_nullfirst"
    d.mkdir()
    pq.write_table(
        pa.table({"x": pa.array([None, None], type=pa.int64())}),
        str(d / "a.parquet"),
    )
    pq.write_table(
        pa.table({"x": pa.array([100, 200], type=pa.int64())}),
        str(d / "b.parquet"),
    )
    zm = SK.build_zone_map_distributed(spark, str(d), ["x"])
    assert zm[0]["x_min"] is None and zm[0]["x_max"] is None
    assert zm[1]["x_min"] == 100 and isinstance(zm[1]["x_min"], int)
    # pruning with int bounds must neither raise nor compare as strings
    kept = SK.prune_files(zm, "x", 150, None)
    assert [k.rsplit("/", 1)[1] for k in kept] == ["a.parquet", "b.parquet"]
    kept2 = SK.prune_files(zm, "x", 250, None)
    assert [k.rsplit("/", 1)[1] for k in kept2] == ["a.parquet"]


def test_versioned_upsert_schema_evolution(spark, tmp_path):
    """A new column arriving in the update feed merges on write: old
    rows null-fill it, pinned old versions keep the old schema."""
    store = str(tmp_path / "vstore5")
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, tag string")
    updates = spark.createDataFrame(
        [(2, "b2", 9.0), (3, "c", 7.0)], "k long, tag string, score double"
    )
    V.upsert_version(spark, store, base, ["k"])
    V.upsert_version(spark, store, updates, ["k"])
    latest = {
        r["k"]: (r["tag"], r["score"])
        for r in V.read_version(spark, store).collect()
    }
    assert latest == {1: ("a", None), 2: ("b2", 9.0), 3: ("c", 7.0)}
    assert V.read_version(spark, store, 1).columns == ["k", "tag"]


def test_versioned_upsert_rejects_dropped_columns(spark, tmp_path):
    store = str(tmp_path / "vstore6")
    base = spark.createDataFrame([(1, "a", 1.0)], "k long, tag string, v double")
    V.upsert_version(spark, store, base, ["k"])
    narrower = spark.createDataFrame([(2, "b")], "k long, tag string")
    with pytest.raises(ValueError, match="missing store columns"):
        V.upsert_version(spark, store, narrower, ["k"])
    # explicit opt-in null-fills deliberately
    V.upsert_version(
        spark, store, narrower, ["k"], allow_missing_update_columns=True
    )
    latest = {r["k"]: r["v"] for r in V.read_version(spark, store).collect()}
    assert latest == {1: 1.0, 2: None}


def test_versioned_compact_sweeps_stale_stages(spark, tmp_path):
    """Once a store is compacted, vacuum() refuses it — so
    compact_versions is the ONLY reclamation path for __stage_*
    leftovers from crashed writers. It must sweep stages older than
    stage_ttl_s and leave fresh ones (in-flight writers) alone."""
    import time

    store = str(tmp_path / "compact_stages")
    for i in range(3):
        V.write_version(spark.range(i * 2, i * 2 + 2), store)
    # a crashed writer's orphaned stage, artificially aged past the TTL
    stale = f"{store}/__stage_deadbeef0001"
    os.makedirs(stale)
    old = time.time() - 100_000
    os.utime(stale, (old, old))
    fresh = f"{store}/__stage_cafebabe0002"
    os.makedirs(fresh)
    before = sorted(r["id"] for r in V.read_all_versions(spark, store).collect())
    V.compact_versions(spark, store)
    names = set(os.listdir(store))
    assert "__stage_deadbeef0001" not in names, "stale stage must be swept"
    assert "__stage_cafebabe0002" in names, "fresh stage survives (TTL)"
    after = sorted(r["id"] for r in V.read_all_versions(spark, store).collect())
    assert after == before
    # vacuum still refuses the compacted store (data-not-history rule)
    with pytest.raises(ValueError, match="compacted"):
        V.vacuum(spark, store)
    # force-sweep path: ttl=0 clears the remaining stage on a recompact
    V.write_version(spark.range(100, 101), store)
    V.compact_versions(spark, store, stage_ttl_s=0)
    assert not [
        n for n in os.listdir(store) if n.startswith("__stage_")
    ]
