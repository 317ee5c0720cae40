"""Sketch guarantees: KMV estimate accuracy + exactness below k, CMS
never-undercount + error bound, and both sketches' merge laws."""

import pytest
from pyspark.sql import functions as F

from fugue_warehouses_spark.extensions import sketches as SK


@pytest.fixture(scope="module")
def vals(spark):
    # 5000 rows over 1200 distinct keys, skewed (key 7 is hot).
    rows = [(i % 1200,) for i in range(3800)] + [(7,) for _ in range(1200)]
    return spark.createDataFrame(rows, "k long")


def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "k long")
    row = SK.kmv_distinct(df, "k", k=256).collect()[0]
    assert row["est_distinct"] == 100
    assert row["sketch_size"] == 100


def test_kmv_estimate_within_rsd(vals):
    # k=256 -> rsd ~ 1/sqrt(k-2) ~ 6.3%; allow 4 sigma.
    row = SK.kmv_distinct(vals, "k", k=256).collect()[0]
    assert row["sketch_size"] == 256
    assert abs(row["est_distinct"] - 1200) / 1200 < 0.25


def test_kmv_merge_equals_whole(spark, vals):
    a = vals.filter(F.col("k") < 600)
    b = vals.filter(F.col("k") >= 600)
    merged = SK.kmv_merge(
        SK.kmv_sketch(a, "k", 256), SK.kmv_sketch(b, "k", 256), 256
    )
    whole = SK.kmv_sketch(vals, "k", 256)
    assert sorted(r["h"] for r in merged.collect()) == sorted(
        r["h"] for r in whole.collect()
    )


def test_cms_never_undercounts_and_bounded(spark, vals):
    sketch = SK.cms_sketch(vals, "k", depth=4, width=256)
    keys = vals.filter(F.col("k") < 20)
    est = {
        r["k"]: r["est_count"]
        for r in SK.cms_estimate(sketch, keys, "k", 4, 256).collect()
    }
    true = {
        r["k"]: r["cnt"]
        for r in vals.filter(F.col("k") < 20)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    n = vals.count()
    for k, t in true.items():
        assert est[k] >= t  # CMS is one-sided
        # standard bound: overcount <= e*N/width w.h.p.; allow 2x slack
        assert est[k] - t <= 2 * 2.72 * n / 256
    # the hot key's estimate stays near-exact (it dominates its buckets)
    assert est[7] >= 1200


def test_cms_merge_equals_whole(spark, vals):
    a = vals.filter(F.col("k") % 2 == 0)
    b = vals.filter(F.col("k") % 2 == 1)
    merged = SK.cms_merge(
        SK.cms_sketch(a, "k", 4, 256), SK.cms_sketch(b, "k", 4, 256)
    )
    whole = SK.cms_sketch(vals, "k", 4, 256)
    to_map = lambda df: {
        (r["row"], r["bucket"]): r["cnt"] for r in df.collect()
    }
    assert to_map(merged) == to_map(whole)


def test_sketch_sizes_bounded(vals):
    assert SK.kmv_sketch(vals, "k", 64).count() == 64
    assert SK.cms_sketch(vals, "k", 4, 32).count() <= 4 * 32


def test_kmv_rollup_merge_equals_fresh_sketch(spark):
    from fugue_warehouses_spark.extensions.sketches import (
        kmv_distinct,
        kmv_rollup,
    )

    df = spark.range(0, 5000).select(
        (F.col("id") % 4).cast("string").alias("g"),
        (F.col("id") % 1900).alias("v"),
    )
    rows = {r["scope"]: r for r in kmv_rollup(df, "g", "v", k=128).collect()}
    assert set(rows) == {"0", "1", "2", "3", "ALL"}
    # the merged register must be EXACTLY what a fresh full-data sketch
    # yields: top-k of the union of group top-k sets == global top-k
    fresh = kmv_distinct(df.select("v"), "v", k=128).collect()[0]
    assert rows["ALL"]["est_distinct"] == fresh["est_distinct"]
    assert rows["ALL"]["kth_min_hash"] == fresh["kth_min_hash"]
    # estimates track truth within the usual ~1/sqrt(k) band
    assert abs(rows["ALL"]["est_distinct"] - 1900) / 1900 < 0.25


def test_kmv_set_estimates_accuracy(spark):
    from fugue_warehouses_spark.extensions.sketches import kmv_set_estimates

    # A = {0..3999}, B = {2000..7999}: |A|=4000, |B|=6000,
    # |A∪B|=8000, |A∩B|=2000
    a = spark.range(0, 4000).withColumnRenamed("id", "v")
    b = spark.range(2000, 8000).withColumnRenamed("id", "v")
    est = {r["op"]: r for r in kmv_set_estimates(a, b, "v", k=256).collect()}
    truth = {"A": 4000, "B": 6000, "UNION": 8000, "INTERSECT": 2000}
    for op, t in truth.items():
        e = est[op]["est_distinct"]
        # KMV with k=256 has ~1/sqrt(k) ≈ 6% RSE; intersection compounds
        # both sketches' error — allow 25%
        tol = 0.25 if op == "INTERSECT" else 0.15
        assert abs(e - t) / t < tol, (op, e, t)
    assert est["INTERSECT"]["theta"] == min(est["A"]["theta"], est["B"]["theta"])


def test_kmv_set_estimates_exact_under_capacity(spark):
    from fugue_warehouses_spark.extensions.sketches import kmv_set_estimates

    a = spark.range(0, 100).withColumnRenamed("id", "v")
    b = spark.range(50, 150).withColumnRenamed("id", "v")
    est = {r["op"]: r["est_distinct"]
           for r in kmv_set_estimates(a, b, "v", k=256).collect()}
    # both sketches under capacity -> all four estimates are EXACT
    assert est == {"A": 100, "B": 100, "UNION": 150, "INTERSECT": 50}


def test_kmv_set_estimates_disjoint_sets(spark):
    from fugue_warehouses_spark.extensions.sketches import kmv_set_estimates

    a = spark.range(0, 5000).withColumnRenamed("id", "v")
    b = spark.range(100_000, 105_000).withColumnRenamed("id", "v")
    est = {r["op"]: r for r in kmv_set_estimates(a, b, "v", k=128).collect()}
    # INTERSECT row must exist with a (near-)zero estimate
    assert est["INTERSECT"]["sample_size"] <= 2


def test_kmv_trailing_rollup_windows(spark):
    from pyspark.sql import functions as F

    from fugue_warehouses_spark.extensions.sketches import kmv_trailing_rollup

    # buckets 0..3, each with a disjoint set of 50 users; bucket 5
    # exists too (gap at 4)
    rows = [(b, b * 1000 + u) for b in (0, 1, 2, 3, 5) for u in range(50)]
    df = spark.createDataFrame(rows, "b long, user long")
    out = {r["bucket"]: r for r in
           kmv_trailing_rollup(df, "b", "user", k=256, trailing=2).collect()}
    # window at bucket b covers buckets (b-1, b); all under capacity -> exact
    assert out[0]["est_distinct"] == 50          # only bucket 0
    assert out[1]["est_distinct"] == 100         # 0 + 1
    assert out[3]["est_distinct"] == 100         # 2 + 3
    assert out[5]["est_distinct"] == 50          # gap: bucket 4 absent
    assert 4 not in out, "windows only for buckets present in the data"
    # with shared users the union dedups
    df2 = spark.createDataFrame(
        [(0, u) for u in range(50)] + [(1, u) for u in range(50)],
        "b long, user long",
    )
    out2 = {r["bucket"]: r["est_distinct"] for r in
            kmv_trailing_rollup(df2, "b", "user", k=256, trailing=2).collect()}
    assert out2 == {0: 50, 1: 50}
