import pytest
from pyspark.sql import functions as F

from fugue_warehouses_spark.extensions import dedup as D


@pytest.fixture(scope="module")
def docs(spark):
    base = (
        "the quick brown fox jumps over the lazy dog and then runs away "
        "into the deep dark forest to find some food for the winter"
    )
    near = base.replace("winter", "summer")
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, near),  # near dup of 0
        (3, "completely different text about spark shuffles and joins ok"),
        (4, "another unrelated document mentioning embeddings and vectors"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    assert D.exact_dedup(docs, ["text"]).count() == 4


def test_fingerprint_dedup_keeps_min_id(spark, docs):
    out = D.fingerprint_dedup(docs, "text", "doc_id")
    ids = {r["doc_id"] for r in out.collect()}
    assert ids == {0, 2, 3, 4}


def test_ngram_jaccard_pairs(spark, docs):
    pairs = D.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.6).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 1) in got and (0, 2) in got and (1, 2) in got
    assert all(r["jaccard_sim"] <= 1.0 for r in pairs)
    exact = [r for r in pairs if (r["id_a"], r["id_b"]) == (0, 1)][0]
    assert exact["jaccard_sim"] == 1.0


def test_minhash_near_dup_pairs(spark, docs):
    pairs = D.near_dup_pairs_minhash(docs, "doc_id", "text", threshold=0.6)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 1) in got and (0, 2) in got
    assert not any(3 in p or 4 in p for p in got)


def test_simhash_near_dup_pairs(spark, docs):
    pairs = D.near_dup_pairs_simhash(docs, "doc_id", "text", max_hamming=6)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 1) in got and (0, 2) in got
    assert not any((3 in p and 4 in p) for p in got)


def test_connected_components_and_dedup(spark, docs):
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4)], "id_a long, id_b long"
    )
    comps = {r["id"]: r["component"] for r in D.connected_components(edges).collect()}
    assert comps == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3}
    kept = D.dedup_near(docs, edges, "doc_id")
    assert {r["doc_id"] for r in kept.collect()} == {0, 3}


def test_chain_components_converge(spark):
    # a 6-node chain exercises multi-round propagation
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "id_a long, id_b long"
    )
    comps = {r["id"]: r["component"] for r in D.connected_components(edges).collect()}
    assert set(comps.values()) == {0}


def test_minhash_on_real_documents(spark, tables):
    docs = tables["documents"]
    pairs = D.near_dup_pairs_minhash(docs, "doc_id", "text", threshold=0.9)
    # deterministic: run twice, same result
    a = sorted((r["id_a"], r["id_b"]) for r in pairs.collect())
    b = sorted((r["id_a"], r["id_b"]) for r in pairs.collect())
    assert a == b


def test_minhash_lsh_full_recall_on_fixture(spark, tables):
    """LSH recall is 1.0 on the fixture corpus: the banded MinHash
    pipeline finds EXACTLY the pairs exact all-pairs Jaccard finds.

    This is the load-bearing claim behind doc_minhash_near_dups'
    DuckDB oracle (queries.py) — true near-dups in the fixture sit at
    J>=0.9 where the (r=8, b=8) S-curve capture probability is ~1.
    If the fixture's similarity profile ever drifts toward the 0.6
    threshold, this test catches it before the oracle gate does.
    """
    docs = tables["documents"]
    lsh = {
        (r["id_a"], r["id_b"], round(r["jaccard_sim"], 6))
        for r in D.near_dup_pairs_minhash(
            docs, "doc_id", "text", threshold=0.6
        ).collect()
    }
    exact = {
        (r["id_a"], r["id_b"], round(r["jaccard_sim"], 6))
        for r in D.ngram_jaccard_pairs(
            docs, "doc_id", "text", n=5, threshold=0.6
        ).collect()
    }
    assert lsh == exact


def test_minhash_string_ids(spark):
    rows = [("da", "the quick brown fox jumps over the lazy dog " * 4),
            ("db", "the quick brown fox jumps over the lazy dog " * 4),
            ("dc", "a completely different document about spark engines")]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = D.near_dup_pairs_minhash(df, "doc_id", "text", threshold=0.6)
    assert {(r["id_a"], r["id_b"]) for r in out.collect()} == {("da", "db")}


def test_simhash_banding_complete_vs_bruteforce(spark, tables):
    """Pigeonhole completeness: banded SimHash (4 bands, hamming<=3)
    equals brute-force exact Hamming over all pairs — the claim that
    makes doc_simhash_near_dups exact rather than approximate."""
    from fugue_warehouses_spark.extensions.dedup import (
        _simhash_bits_numpy,
        hamming,
    )

    docs = tables["documents"]
    banded = {
        (r["id_a"], r["id_b"], r["hamming_dist"])
        for r in D.near_dup_pairs_simhash(
            docs, "doc_id", "text", max_hamming=3, bands=4
        ).collect()
    }
    bits = _simhash_bits_numpy(docs, "doc_id", "text", 64)
    a = bits.select(F.col("doc_id").alias("id_a"), F.col("__bits").alias("__ba"))
    b = bits.select(F.col("doc_id").alias("id_b"), F.col("__bits").alias("__bb"))
    brute = {
        (r["id_a"], r["id_b"], r["hamming_dist"])
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming_dist", hamming(F.col("__ba"), F.col("__bb")))
        .filter(F.col("hamming_dist") <= 3)
        .collect()
    }
    assert banded == brute


def test_lsh_mega_bucket_cap(spark):
    """max_bucket_size drops degenerate buckets before the self-join:
    a clique of identical docs produces zero candidates under a cap
    smaller than the clique, and the full pair set without it."""
    rows = [(i, "identical boilerplate text repeated " * 5) for i in range(5)]
    rows += [(10, "a unique document about engines"),
             (11, "another unique document entirely different")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = D.near_dup_pairs_minhash(df, "doc_id", "text", threshold=0.9)
    assert len(uncapped.collect()) == 10  # 5-clique = C(5,2)
    capped = D.near_dup_pairs_minhash(
        df, "doc_id", "text", threshold=0.9, max_bucket_size=2
    )
    assert capped.collect() == []
