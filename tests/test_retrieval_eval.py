"""retrieval_eval metric math on a hand-built corpus.

The facet's oracle parity checks cross-engine equality; these tests
check the METRICS are the right numbers — a corpus small enough to
rank by hand, with the BM25 order deliberately disagreeing with the
relevance order (a long spammy doc has the most term hits but BM25's
length normalization demotes it).
"""

from __future__ import annotations

import math

import pytest

from fugue_warehouses_spark.extensions.retrieval import retrieval_eval


def _corpus(spark):
    rows = [
        # doc 1: short, one hit each term -> strong BM25, rel=2
        (1, "cat dog"),
        # doc 2: the argmax-relevance doc: 6 hits but LONG (length
        # normalization demotes it below doc 1 in BM25 order)
        (2, "cat cat cat dog dog dog " + "filler " * 60),
        # doc 3: one term only
        (3, "cat mouse bird"),
        # doc 4: no query terms at all (must not appear anywhere)
        (4, "mouse bird fish"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_metrics_by_hand(spark):
    out = {
        r.query: r
        for r in retrieval_eval(
            _corpus(spark), "doc_id", "text", [("q", ["cat", "dog"])], k=10
        ).collect()
    }
    r = out["q"]
    # relevance: doc1=2, doc2=6, doc3=1; doc4 matched nothing
    assert r.max_rel == 6
    assert r.n_matched == 3
    # BM25 order: doc1 (short, both terms) > doc2 (long) > doc3 —
    # so the argmax-rel doc sits at rank 2
    assert r.mrr == pytest.approx(0.5, abs=1e-6)
    # DCG = 2/log2(2) + 6/log2(3) + 1/log2(4)
    dcg = 2 / 1.0 + 6 / math.log2(3) + 1 / 2.0
    # ideal: 6, 2, 1
    idcg = 6 / 1.0 + 2 / math.log2(3) + 1 / 2.0
    assert r.ndcg == pytest.approx(round(dcg / idcg, 6), abs=2e-6)
    assert r.best_at_k == pytest.approx(0.1, abs=1e-6)


def test_perfect_ranking_scores_one(spark):
    # corpus where BM25 and relevance agree (equal lengths, graded tf)
    rows = [
        (1, "cat cat cat pad pad"),
        (2, "cat cat pad pad pad"),
        (3, "cat pad pad pad pad"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = retrieval_eval(df, "doc_id", "text", [("q", ["cat"])], k=10).collect()[0]
    assert r.mrr == pytest.approx(1.0)
    assert r.ndcg == pytest.approx(1.0)
    assert r.max_rel == 3 and r.n_matched == 3


def test_best_outside_top_k_zeroes_mrr(spark):
    # k=1: the argmax-rel doc (long) is demoted below the short doc,
    # so with a 1-deep cutoff MRR must be 0 and best_at_k 0
    r = retrieval_eval(
        _corpus(spark), "doc_id", "text", [("q", ["cat", "dog"])], k=1
    ).collect()[0]
    assert r.mrr == 0.0
    assert r.best_at_k == 0.0


def test_empty_queries_rejected(spark):
    with pytest.raises(ValueError):
        retrieval_eval(_corpus(spark), "doc_id", "text", [])


def test_string_id_columns_work(spark):
    # the min-id tie-break must not negate the id column (string ids
    # crashed the struct-max formulation under ANSI)
    rows = [("d1", "cat dog"), ("d2", "cat cat dog dog " + "pad " * 40),
            ("d3", "cat mouse")]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    r = retrieval_eval(df, "doc_id", "text", [("q", ["cat", "dog"])], k=10)
    out = r.collect()[0]
    assert out.max_rel == 4 and out.n_matched == 3
    assert 0 < out.mrr <= 1.0 and 0 < out.ndcg <= 1.0
