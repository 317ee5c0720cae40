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


def test_duplicate_spans_empty_and_all_short(spark):
    from fugue_warehouses_spark.extensions import dedup as D

    empty = spark.createDataFrame([], "doc_id long, text string, source string")
    assert D.duplicate_spans(empty).count() == 0
    assert D.duplicate_span_coverage(empty).count() == 0
    short = spark.createDataFrame(
        [(0, "too short", "s"), (1, "also tiny", "s")],
        "doc_id long, text string, source string",
    )
    assert D.duplicate_spans(short, window=8).count() == 0
    row = D.duplicate_span_coverage(short, window=8).collect()[0]
    assert row["n_docs"] == 2 and row["dup_tokens"] == 0


def test_tfidf_keywords_single_group_all_zero_idf(spark):
    """With one group every term's idf is ln(1)=0: scores all zero,
    ranking falls back to token order — still deterministic, k rows."""
    from fugue_warehouses_spark.extensions.retrieval import tfidf_keywords

    df = spark.createDataFrame(
        [("only", "alpha beta beta gamma")], "source string, text string"
    )
    rows = tfidf_keywords(df, "source", "text", k=2).collect()
    assert [r["token"] for r in rows] == ["alpha", "beta"]
    assert all(r["score"] == 0.0 for r in rows)


def test_centroid_outliers_single_member_labels(spark):
    """A 1-vector label IS its centroid: cos=1, never an outlier."""
    from fugue_warehouses_spark.extensions.clustering import (
        label_centroid_outliers,
    )

    df = spark.createDataFrame(
        [(0, [1.0, 2.0], 0), (1, [-3.0, 0.5], 1)],
        "vec_id long, embedding array<float>, label int",
    )
    for r in label_centroid_outliers(df).collect():
        assert r["n_vecs"] == 1 and r["n_outliers"] == 0
        assert r["avg_cos_centroid"] == 1.0


def test_incremental_dedup_empty_history_passthrough(spark):
    from fugue_warehouses_spark.extensions import dedup as D

    hist = spark.createDataFrame([], "doc_id long, text string")
    batch = spark.createDataFrame(
        [(1, "a doc"), (2, "b doc")], "doc_id long, text string"
    )
    assert D.incremental_dedup(batch, hist).count() == 2
