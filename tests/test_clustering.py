"""Lloyd k-means + semantic dedup (extensions/clustering.py):
determinism, convergence direction, bucket-not-all-pairs candidates,
and recall vs exact all-pairs."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fugue_warehouses_spark.extensions.clustering import (
    assign_to_centroids,
    hash_centroid_matrix,
    kmeans_lloyd,
    semantic_dedup,
)
from fugue_warehouses_spark.functions.vectors import cosine


def _vecs(spark, n=60, dim=8, clusters=3, seed=7):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(clusters, dim)) * 5
    rows = []
    for i in range(n):
        c = i % clusters
        rows.append((i, (centers[c] + rng.normal(size=dim) * 0.1).tolist(), c))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, truth int"
    )


def test_assign_picks_nearest_and_keeps_cols(spark):
    df = _vecs(spark)
    cmat = np.array([r["embedding"] for r in df.orderBy("vec_id").limit(3).collect()])
    out = assign_to_centroids(df, "vec_id", "embedding", cmat, keep_cols=("truth",))
    rows = out.collect()
    assert len(rows) == 60
    # init centroids are vectors 0,1,2 whose truth == their own index;
    # tight synthetic clusters => assignment recovers truth exactly
    assert all(r["cidx"] == r["truth"] for r in rows)
    assert all(abs(r["cos_sim"]) <= 1.0 for r in rows)


def test_kmeans_is_deterministic_and_improves(spark):
    df = _vecs(spark)
    a1, c1 = kmeans_lloyd(df, "vec_id", "embedding", k=3, iters=1)
    a2, c2 = kmeans_lloyd(df, "vec_id", "embedding", k=3, iters=2)
    a2b, c2b = kmeans_lloyd(df, "vec_id", "embedding", k=3, iters=2)
    assert np.array_equal(c2, c2b)  # deterministic trajectory
    m1 = a1.agg(F.avg("cos_sim")).collect()[0][0]
    m2 = a2.agg(F.avg("cos_sim")).collect()[0][0]
    assert m2 >= m1 - 1e-9  # Lloyd step cannot reduce mean similarity here


def test_kmeans_every_cluster_nonempty(spark):
    df = _vecs(spark)
    assigned, _ = kmeans_lloyd(df, "vec_id", "embedding", k=3, iters=2)
    assert assigned.select("cidx").distinct().count() == 3


def test_semantic_dedup_flags_planted_dups(spark):
    df = _vecs(spark)
    # plant exact duplicates of vectors 0..4 with higher ids
    dups = df.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding", "truth"
    )
    out = semantic_dedup(
        df.unionByName(dups), "vec_id", "embedding",
        threshold=0.999999, n_centroids=4,
    )
    flagged = {r["vec_id"] for r in out.filter("is_dup").collect()}
    assert flagged == {1000, 1001, 1002, 1003, 1004}  # lower id always kept


def test_semantic_dedup_recall_vs_exact(spark):
    df = _vecs(spark)
    out = semantic_dedup(df, "vec_id", "embedding", threshold=0.98, n_centroids=4)
    got = {r["vec_id"] for r in out.filter("is_dup").collect()}
    a = df.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("va"))
    b = df.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("vb"))
    exact = {
        r["ib"]
        for r in a.join(b, F.col("ia") < F.col("ib"))
        .filter(F.round(cosine(F.col("va"), F.col("vb")), 6) >= 0.98)
        .collect()
    }
    assert got <= exact  # no false positives ever (exact re-rank)
    assert len(got) >= 0.8 * len(exact)  # bucketing recall floor


def test_semantic_dedup_joins_only_within_buckets(spark):
    df = _vecs(spark)
    out = semantic_dedup(df, "vec_id", "embedding", threshold=0.9, n_centroids=4)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "cidx" in plan  # pair join keyed by bucket ...
    assert "Cross" not in plan  # ... never a cartesian product


def test_hash_centroids_match_md5_order(spark):
    df = _vecs(spark)
    cmat = hash_centroid_matrix(df, "vec_id", "embedding", 4)
    expect = (
        df.orderBy(F.md5(F.col("vec_id").cast("string")), F.col("vec_id"))
        .limit(4)
        .collect()
    )
    assert np.allclose(cmat, np.array([r["embedding"] for r in expect]))


def test_assign_rejects_empty_centroids(spark):
    df = _vecs(spark, n=4)
    with pytest.raises(ValueError, match="empty centroid"):
        assign_to_centroids(df, "vec_id", "embedding", np.array([]))


def test_kmeans_drops_empty_cluster_from_duplicate_init(spark):
    """Duplicate init vectors tie every assignment to the lower index;
    the higher-indexed twin ends empty and must be dropped (matching
    the SQL twin's members-only update CTE), with survivors keeping
    their original cidx labels."""
    rows = [
        (0, [1.0, 0.0]),
        (1, [1.0, 0.0]),   # duplicate of init centroid 0
        (2, [0.0, 1.0]),
        (3, [0.0, 0.9]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assigned, cmat = kmeans_lloyd(df, "vec_id", "embedding", k=3, iters=2)
    got = {r["vec_id"]: r["cidx"] for r in assigned.collect()}
    # centroid 1 (duplicate of 0) got no members and is gone; cluster 2
    # keeps its ORIGINAL label even though the matrix shrank to 2 rows
    assert len(cmat) == 2
    assert got == {0: 0, 1: 0, 2: 2, 3: 2}


def test_label_centroid_outliers_flags_flipped_vector(spark):
    from fugue_warehouses_spark.extensions.clustering import (
        label_centroid_outliers,
    )

    rows = [
        (0, [1.0, 0.1], 0),
        (1, [1.0, -0.1], 0),
        (2, [-1.0, 0.0], 0),   # points away from label-0 centroid
        (3, [0.0, 1.0], 1),
        (4, [0.1, 1.0], 1),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r["label"]: r for r in label_centroid_outliers(df).collect()}
    assert out[0]["n_vecs"] == 3 and out[0]["n_outliers"] == 1
    assert out[1]["n_vecs"] == 2 and out[1]["n_outliers"] == 0
