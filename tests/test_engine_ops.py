import os

import pytest

from fugue_warehouses_spark.engine import SparkWarehouseEngine
from fugue_warehouses_spark.frame import assert_eq


@pytest.fixture(scope="module")
def eng(spark):
    return SparkWarehouseEngine(spark)


def _ab(eng, rows):
    return eng.to_df(rows, "a:str,b:long")


def test_joins_all_types(eng):
    left = eng.to_df([["a", 1], ["b", 2]], "x:str,b:long")
    right = eng.to_df([["a", True], ["c", False]], "x:str,c:bool")
    assert_eq(eng.join(left, right, "inner"), [["a", 1, True]])
    assert_eq(
        eng.join(left, right, "left_outer"), [["a", 1, True], ["b", 2, None]]
    )
    assert_eq(
        eng.join(left, right, "right_outer"), [["a", 1, True], ["c", None, False]]
    )
    assert_eq(
        eng.join(left, right, "full_outer"),
        [["a", 1, True], ["b", 2, None], ["c", None, False]],
    )
    # semi/anti: left schema only
    semi = eng.join(left, right, "semi")
    assert semi.columns == ["x", "b"]
    assert_eq(semi, [["a", 1]])
    anti = eng.join(left, right, "anti")
    assert_eq(anti, [["b", 2]])
    cross = eng.join(left, right, "cross")
    assert cross.count() == 4


def test_semi_right_dupes_do_not_multiply(eng):
    left = eng.to_df([["a", 1]], "x:str,b:long")
    right = eng.to_df([["a", True], ["a", False]], "x:str,c:bool")
    assert_eq(eng.join(left, right, "semi"), [["a", 1]])


def test_set_ops(eng):
    d1 = _ab(eng, [["a", 1], ["b", 2], ["b", 2]])
    d2 = _ab(eng, [["b", 2], ["c", 3]])
    assert_eq(eng.union(d1, d2), [["a", 1], ["b", 2], ["c", 3]])
    assert_eq(
        eng.union(d1, d2, distinct=False),
        [["a", 1], ["b", 2], ["b", 2], ["b", 2], ["c", 3]],
    )
    assert_eq(eng.intersect(d1, d2), [["b", 2]])
    assert_eq(eng.subtract(d1, d2), [["a", 1]])
    assert_eq(eng.distinct(d1), [["a", 1], ["b", 2]])


def test_dropna_fillna(eng):
    d = eng.to_df([["a", 1.0], [None, 2.0], [None, None]], "a:str,b:double")
    assert_eq(eng.dropna(d), [["a", 1.0]])
    assert_eq(eng.dropna(d, how="all"), [["a", 1.0], [None, 2.0]])
    assert_eq(eng.dropna(d, subset=["b"]), [["a", 1.0], [None, 2.0]])
    assert_eq(
        eng.fillna(d, {"a": "?", "b": 0.0}),
        [["a", 1.0], ["?", 2.0], ["?", 0.0]],
    )


def test_sample(eng):
    rows = [[i] for i in range(100)]
    d = eng.to_df(rows, "a:long")
    assert eng.sample(d, n=90).count() == 90
    c = eng.sample(d, frac=0.5, seed=42).count()
    assert 20 <= c <= 80
    with pytest.raises(ValueError):
        eng.sample(d)
    with pytest.raises(ValueError):
        eng.sample(d, n=5, frac=0.5)


def test_take_global_and_partitioned(eng):
    d = eng.to_df(
        [["a", 3], ["a", 1], ["a", 2], ["b", 10], ["b", 20], [None, 5]],
        "k:str,v:long",
    )
    assert_eq(eng.take(d, 1, presort="v desc"), [["b", 20]])
    assert_eq(
        eng.take(d, 1, presort="v asc", partition_by=["k"]),
        [["a", 1], ["b", 10], [None, 5]],
    )
    # nulls-first default on asc
    assert_eq(
        eng.take(d, 2, presort="v asc"),
        [["a", 1], ["a", 2]],
    )


def test_take_null_position(eng):
    d = eng.to_df([["a", None], ["b", 1], ["c", 2]], "k:str,v:long")
    assert_eq(eng.take(d, 1, presort="v asc", na_position="first"), [["a", None]])
    assert_eq(eng.take(d, 1, presort="v asc", na_position="last"), [["b", 1]])


def test_aggregate(eng):
    d = eng.to_df([["a", 1], ["a", 2], ["b", 5]], "k:str,v:long")
    assert_eq(
        eng.aggregate(d, ["k"], {"s": "sum(v)", "n": "count(*)"}),
        [["a", 3, 2], ["b", 5, 1]],
    )
    assert_eq(eng.aggregate(d, None, {"mx": "max(v)"}), [[5]])


def test_sql_select_fragments(eng):
    d1 = eng.to_df([[1, 10], [2, 20], [3, 30]], "x:long,y:long")
    d2 = eng.to_df([[2, 20, 40], [3, 30, 90]], "x:long,y:long,z:long")
    res = eng.select(
        "SELECT t1.*, z AS zb FROM",
        d1,
        "AS t1 INNER JOIN",
        d2,
        "AS t2 ON t1.x = t2.x",
    )
    assert_eq(res, [[2, 20, 40], [3, 30, 90]])
    # implicit leading SELECT + literal select
    assert_eq(eng.select("'test' AS a"), [["test"]])
    assert_eq(eng.select("* FROM", d1, "WHERE x > 2"), [[3, 30]])


def test_repartition_and_broadcast(eng):
    d = eng.to_df([[i, i % 3] for i in range(30)], "a:long,k:long")
    assert eng.repartition(d, num=5).native.rdd.getNumPartitions() == 5
    by = eng.repartition(d, by=["k"], presort="a desc")
    assert by.count() == 30
    assert eng.broadcast(d).count() == 30


def test_persist_and_checkpoint(eng, tmp_path):
    eng.spark.conf.set(
        "spark.fugue_warehouses.checkpoint.dir", str(tmp_path / "ckpt")
    )
    d = eng.to_df([["a", 1], ["b", 2]], "a:str,b:long")
    p = eng.persist(d)
    assert p.count() == 2
    c1 = eng.checkpoint(d)
    assert_eq(c1, [["a", 1], ["b", 2]])
    # same logical plan -> same materialization (dir count stays 1)
    d2 = eng.to_df([["a", 1], ["b", 2]], "a:str,b:long")
    eng.checkpoint(d2)
    roots = list((tmp_path / "ckpt").iterdir())
    assert len(roots) == 1


def test_save_load_roundtrip(eng, tmp_path):
    d = eng.to_df([["a", 1], ["b", 2]], "a:str,b:long")
    path = str(tmp_path / "out.parquet")
    eng.save_df(d, path)
    back = eng.load_df(path)
    assert_eq(back, [["a", 1], ["b", 2]])
    # force_single -> one data file
    single = str(tmp_path / "single.parquet")
    eng.save_df(d, single, force_single=True)
    files = [f for f in os.listdir(single) if f.endswith(".parquet")]
    assert len(files) == 1
    # csv with header
    csvp = str(tmp_path / "out.csv")
    eng.save_df(d, csvp, header="true")
    back2 = eng.load_df(csvp)
    assert back2.count() == 2


def test_save_table_and_exists(eng):
    d = eng.to_df([["a", 1]], "a:str,b:long")
    eng.register_temp(d, "ttmp1")
    assert eng.table_exists("ttmp1")
    loaded = eng.load_table("ttmp1")
    assert_eq(loaded, [["a", 1]])
    loaded2 = eng.load_table("SELECT a FROM ttmp1")
    assert_eq(loaded2, [["a"]])
    eng.drop_temp("ttmp1")
    assert not eng.table_exists("ttmp1")


def test_approx_count_distinct_within_tolerance(eng):
    """§2.C approximate aggregates: HLL++ estimate within 5% of exact."""
    from pyspark.sql import functions as F

    df = eng.spark.range(0, 20000).selectExpr("id % 5000 AS k")
    exact = df.select(F.count_distinct("k")).collect()[0][0]
    approx = df.select(F.approx_count_distinct("k", rsd=0.02)).collect()[0][0]
    assert exact == 5000
    assert abs(approx - exact) / exact < 0.05


def test_save_load_csv_json_roundtrip(eng, tmp_path):
    """A5/A7 format matrix: csv (header+inferSchema) and json line
    format round-trip through save_df/load_df."""
    d = eng.to_df([["a", 1, 1.5], ["b", 2, 2.5]], "s:str,x:long,v:double")
    for fmt in ("csv", "json"):
        path = str(tmp_path / f"out_{fmt}")
        eng.save_df(d, path, fmt=fmt)
        back = eng.load_df(path, fmt=fmt)
        # json infers columns alphabetically; select to fix order
        rows = sorted(tuple(r) for r in back.native.select("s", "x", "v").collect())
        assert rows == [("a", 1, 1.5), ("b", 2, 2.5)]


def test_save_df_partition_by_and_force_single(eng, tmp_path):
    import os

    d = eng.to_df([["a", 1], ["a", 2], ["b", 3]], "k:str,x:long")
    path = str(tmp_path / "parts")
    eng.save_df(d, path, partition_by=["k"])
    assert sorted(
        n for n in os.listdir(path) if n.startswith("k=")
    ) == ["k=a", "k=b"]
    single = str(tmp_path / "single")
    eng.save_df(d, single, force_single=True)
    files = [n for n in os.listdir(single) if n.endswith(".parquet")]
    assert len(files) == 1


def test_analyze_table_populates_catalog_stats(eng, tables):
    """A22+ catalog statistics: ANALYZE writes row/byte counts the CBO
    (and metadata count paths) can read back without a scan."""
    eng.spark.sql("DROP TABLE IF EXISTS _stats_demo")
    eng.save_table(tables["nation"], "_stats_demo")
    try:
        assert eng.table_stats("_stats_demo") == {} or "rows" not in eng.table_stats("_stats_demo")
        eng.analyze_table("_stats_demo", columns=["n_nationkey"])
        stats = eng.table_stats("_stats_demo")
        assert stats.get("rows") == tables["nation"].count()
        assert stats.get("bytes", 0) > 0
    finally:
        eng.spark.sql("DROP TABLE IF EXISTS _stats_demo")


def test_repartition_per_row(eng):
    """PartitionSpec("per_row") analog: exactly one row per partition
    (reference fan-out, fugue_bigquery/client.py:294)."""
    d = eng.to_df([["a", 1], ["b", 2], ["c", 3], ["d", 4], ["e", 5]], "x:str,b:long")
    out = eng.repartition(d, algo="per_row")
    sizes = out.native.rdd.glom().map(len).collect()
    assert sorted(sizes) == [1, 1, 1, 1, 1]
    assert_eq(out, [["a", 1], ["b", 2], ["c", 3], ["d", 4], ["e", 5]])
    empty = eng.repartition(eng.to_df([], "x:str,b:long"), algo="per_row")
    assert empty.count() == 0


def test_load_table_sample_pushdown(eng, spark):
    """Source-level sample (reference TABLESAMPLE emission,
    fugue_bigquery/_utils.py:99-117): bounded cardinality like
    tests/fugue_bigquery/test_execution_engine.py:39-58, and the
    Sample node sits BELOW later wide ops in the plan."""
    spark.range(10000).selectExpr("id", "id % 7 AS g").write.mode(
        "overwrite"
    ).saveAsTable("sample_push_src")
    try:
        with pytest.raises(ValueError):
            eng.load_table("sample_push_src", sample=1.5)
        s = eng.load_table("sample_push_src", sample=0.5)
        n = s.count()
        assert 3500 < n < 6500  # Bernoulli bound, generous
        # sample must push below a later aggregate
        agg = eng.aggregate(s, ["g"], {"n": "count(*)"})
        plan = agg.native._jdf.queryExecution().optimizedPlan().toString()
        agg_pos = plan.find("Aggregate")
        sample_pos = plan.find("Sample")
        assert agg_pos >= 0 and sample_pos > agg_pos  # Sample deeper (below)
    finally:
        spark.sql("DROP TABLE IF EXISTS sample_push_src")


def test_load_table_file_sample_cuts_scan(eng, spark):
    """sample_unit='files' (TABLESAMPLE SYSTEM analog): the sampled
    relation reads a strict SUBSET of the table's files — a true
    scan-cost cut, deterministic across calls — with schema pinned."""
    spark.range(20000).selectExpr("id", "id % 7 AS g").repartition(
        16
    ).write.mode("overwrite").saveAsTable("file_sample_src")
    try:
        full = eng.load_table("file_sample_src")
        s = eng.load_table("file_sample_src", sample=0.25, sample_unit="files")
        full_files = set(full.native.inputFiles())
        s_files = set(s.native.inputFiles())
        assert s_files and s_files < full_files
        assert len(s_files) < len(full_files) * 0.7  # real cut, p=0.25
        assert s.native.schema == full.native.schema
        # whole-file granularity: sampled rows = union of chosen files
        assert 0 < s.count() < full.count()
        # deterministic: same files on a second call
        s2 = eng.load_table("file_sample_src", sample=0.25, sample_unit="files")
        assert set(s2.native.inputFiles()) == s_files
        # tiny fraction still keeps at least one file
        tiny = eng.load_table(
            "file_sample_src", sample=1e-9, sample_unit="files"
        )
        assert len(tiny.native.inputFiles()) == 1
        with pytest.raises(ValueError, match="rows|files"):
            eng.load_table("file_sample_src", sample=0.5, sample_unit="bogus")
        # SELECT sources must refuse: re-reading the base files would
        # silently drop the query's own filters/projections
        with pytest.raises(ValueError, match="plain tables"):
            eng.load_table(
                "SELECT id FROM file_sample_src WHERE id > 10",
                sample=0.5,
                sample_unit="files",
            )
    finally:
        spark.sql("DROP TABLE IF EXISTS file_sample_src")


def test_load_table_file_sample_partitioned_table(eng, spark):
    """Hive-partitioned tables: the sampled re-read must rediscover the
    partition-directory column (basePath), not null-fill it."""
    spark.range(4000).selectExpr("id", "id % 4 AS g").repartition(
        8
    ).write.mode("overwrite").partitionBy("g").saveAsTable("file_sample_part")
    try:
        s = eng.load_table("file_sample_part", sample=0.5, sample_unit="files")
        rows = s.native.groupBy("g").count().collect()
        assert rows, "sampled relation is empty"
        assert all(r["g"] is not None for r in rows)
        # whole-file granularity: every sampled row's g matches its file's
        # partition directory (would be NULL if basePath were missing)
        gs = {r["g"] for r in rows}
        assert gs <= {0, 1, 2, 3}
    finally:
        spark.sql("DROP TABLE IF EXISTS file_sample_part")


def test_load_table_file_sample_single_partition_value(eng, spark):
    """A partitioned table where every row shares ONE partition value
    lists the partition dir inside the common root ('.../g=1/part-*');
    the basePath fix must still rediscover g instead of null-filling
    it from the pinned schema."""
    spark.range(2000).selectExpr("id", "CAST(1 AS BIGINT) AS g").repartition(
        8
    ).write.mode("overwrite").partitionBy("g").saveAsTable("file_sample_one")
    try:
        s = eng.load_table("file_sample_one", sample=0.5, sample_unit="files")
        rows = s.native.groupBy("g").count().collect()
        assert rows, "sampled relation is empty"
        assert all(r["g"] == 1 for r in rows)
    finally:
        spark.sql("DROP TABLE IF EXISTS file_sample_one")


def test_load_table_file_sample_table_dir_with_equals(eng, spark, tmp_path):
    """An UNPARTITIONED table whose directory name merely contains '='
    must not be mistaken for a hive layout: with basePath + a pinned
    schema Spark would APPEND the phantom 'partition' column, silently
    changing the sampled schema."""
    path = str(tmp_path / "t=x")
    spark.range(2000).selectExpr("id", "id * 2 AS v").repartition(
        8
    ).write.parquet(path)
    f = eng.load_df(path)
    s = eng._sample_files(f.native, 0.5)
    assert s.columns == ["id", "v"]  # no phantom 't' column
    assert 0 < s.count() < 2000


def test_load_table_sample_unit_validated_without_sample(eng):
    """A typo'd unit — or files-unit with no fraction — must raise even
    when sample is None, not be silently ignored."""
    with pytest.raises(ValueError, match="rows|files"):
        eng.load_table("orders", sample_unit="bogus")
    with pytest.raises(ValueError, match="without a sample"):
        eng.load_table("orders", sample_unit="files")


def test_join_strategy_hints_pin_physical_plan(spark, sf_dir, eng):
    """strategy= pins the physical join without changing results."""
    from fugue_warehouses_spark.sources import load_star_table

    o = load_star_table(spark, sf_dir, "orders")
    c = load_star_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    merged = eng.join(o, c, "inner", on=["o_custkey"], strategy="merge")
    plan = merged.native._sc._jvm.PythonSQLUtils.explainString(
        merged.native._jdf.queryExecution(), "simple"
    )
    assert "SortMergeJoin" in plan
    bcast = eng.join(o, c, "inner", on=["o_custkey"], strategy="broadcast")
    plan_b = bcast.native._sc._jvm.PythonSQLUtils.explainString(
        bcast.native._jdf.queryExecution(), "simple"
    )
    assert "BroadcastHashJoin" in plan_b
    assert merged.count() == bcast.count()


def test_join_strategy_rejects_unknown(spark, eng):
    import pytest as _pytest

    df = spark.range(3)
    with _pytest.raises(ValueError, match="unknown join strategy"):
        eng.join(df, df, "inner", on=["id"], strategy="hash_loop")


def test_load_table_file_sample_root_named_like_data_column(eng, spark, tmp_path):
    """An UNPARTITIONED table written under a root that LOOKS like a
    hive partition dir of one of its own DATA columns ('.../g=2/' with
    a real column g in the parquet files) must be read as-is: setting
    basePath above that root would make partition discovery OVERWRITE
    every row's g with the literal 2 — silent corruption. The guard is
    the physical-schema check: a genuine hive partition column is
    never stored in the data files."""
    path = str(tmp_path / "g=2")
    spark.range(2000).selectExpr("id", "CAST(id % 5 AS BIGINT) AS g").repartition(
        8
    ).write.parquet(path)
    f = eng.load_df(path)
    s = eng._sample_files(f.native, 0.5)
    assert s.columns == ["id", "g"]
    rows = s.collect()
    assert rows
    # g keeps its per-row data values — NOT the directory literal 2
    assert all(r["g"] == r["id"] % 5 for r in rows)
    assert {r["g"] for r in rows} != {2}
