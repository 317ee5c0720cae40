import pytest
from pyspark.sql import functions as F

from fugue_warehouses_spark.extensions import similarity as S


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.0, 1.0]),
        (4, [-1.0, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_brute_force_topk(spark, vecs):
    out = S.brute_force_topk(vecs, vecs.filter(F.col("vec_id") == 0), k=2)
    rows = sorted(out.collect(), key=lambda r: -r["cosine_sim"])
    assert [r["match_id"] for r in rows] == [1, 2]
    assert rows[0]["cosine_sim"] > 0.99


def test_brute_force_topk_deterministic_ties(spark):
    rows = [(i, [1.0, 0.0]) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = S.brute_force_topk(df, df.filter(F.col("vec_id") == 0), k=3).collect()
    assert [r["match_id"] for r in out] == [1, 2, 3]


def test_similarity_pairs(spark, vecs):
    out = S.similarity_pairs(vecs, threshold=0.9)
    got = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert got == {(0, 1)}


def test_lsh_topk_recall_on_real_embeddings(spark, tables):
    emb = tables["embeddings"].withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    queries = emb.filter(F.col("vec_id") < 5)
    exact = S.brute_force_topk(emb, queries, k=5)
    # fixture embeddings are near-random (top-5 cosine ~0.3), so use
    # short signatures + many tables; real clustered embeddings would
    # take longer signatures and fewer tables
    approx = S.lsh_topk(emb, queries, k=5, dim=64, n_planes=4, n_tables=16)
    e = {(r["query_id"], r["match_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["match_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"LSH recall too low: {recall}"


def test_lsh_topk_caps_k(spark, vecs):
    out = S.lsh_topk(vecs, vecs, k=2, dim=3, n_planes=4, n_tables=8)
    counts = out.groupBy("query_id").count().collect()
    assert all(r["count"] <= 2 for r in counts)


def test_ivf_topk_recall_on_real_embeddings(spark, tables):
    from pyspark.sql import functions as F

    emb = tables["embeddings"]
    queries = emb.filter(F.col("vec_id") < 20)
    exact = S.brute_force_topk(emb, queries, k=5)
    approx = S.ivf_topk(emb, queries, k=5, n_centroids=32, n_probe=8)
    e = {(r["query_id"], r["match_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["match_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"IVF recall too low: {recall}"
    # determinism: same call twice, same rows
    b = {(r["query_id"], r["match_id"]) for r in S.ivf_topk(
        emb, queries, k=5, n_centroids=32, n_probe=8).collect()}
    assert a == b
