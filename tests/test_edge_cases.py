"""Empty/degenerate-input behavior of the extension pipelines."""

from __future__ import annotations

from pyspark.sql import functions as F

from fugue_warehouses_spark.extensions import dedup as D
from fugue_warehouses_spark.extensions import similarity as S
from fugue_warehouses_spark.streaming import tumbling_agg


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


def test_minhash_empty_corpus(spark):
    assert D.near_dup_pairs_minhash(_empty_docs(spark), "doc_id", "text").count() == 0


def test_minhash_null_and_short_text(spark):
    docs = spark.createDataFrame(
        [(0, None), (1, ""), (2, "ab"), (3, "ab")],
        "doc_id long, text string",
    )
    pairs = D.near_dup_pairs_minhash(docs, "doc_id", "text", threshold=0.9)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # identical short texts are found; nothing crashes on null/empty
    assert (2, 3) in got


def test_simhash_empty_corpus(spark):
    assert D.near_dup_pairs_simhash(_empty_docs(spark), "doc_id", "text").count() == 0


def test_connected_components_empty_edges(spark):
    edges = spark.createDataFrame([], "id_a long, id_b long")
    assert D.connected_components(edges).count() == 0


def test_similarity_pairs_zero_vectors(spark):
    emb = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    # zero vectors normalize to zero -> cosine 0 with everything; the
    # two zero vectors must NOT count as perfect matches of each other
    pairs = S.similarity_pairs(emb, threshold=0.5)
    assert pairs.filter(
        (F.col("id_a") == 0) & (F.col("id_b") == 2)
    ).count() == 0


def test_tumbling_agg_empty_batch(spark):
    ev = spark.createDataFrame([], "ts timestamp_ntz, value double")
    out = tumbling_agg(ev, "ts", "15 minutes", {"n": "count(1)"})
    assert out.count() == 0
    assert set(out.columns) == {"window_start", "window_end", "n"}


def test_approx_distinct_within_rsd(spark, sf_dir):
    from fugue_warehouses_spark.queries import QUERIES

    row = QUERIES["orders_approx_distinct"](spark, sf_dir).collect()[0]
    exact = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert abs(row["approx_custkeys"] - exact) / exact < 0.05
