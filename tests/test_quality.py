"""Repetition metrics + PII redaction (extensions/quality.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fugue_warehouses_spark.extensions.quality import (
    redact_pii,
    repetition_flags,
    repetition_metrics,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "a a a a b", "s1"),           # top_frac 0.8, dup 0.6
            (2, "w x y z", "s1"),             # all distinct
            (3, "  spaced   out  text ", "s2"),
            (4, "", "s2"),                    # empty: drops out
        ],
        "doc_id long, text string, source string",
    )


def test_repetition_metrics_exact(spark):
    m = {
        r["doc_id"]: r
        for r in repetition_metrics(_docs(spark), "doc_id", "text").collect()
    }
    assert 4 not in m  # empty doc has no tokens
    assert (m[1]["n_tokens"], m[1]["n_distinct"], m[1]["top_token_count"]) == (5, 2, 4)
    assert abs(m[1]["dup_frac"] - 0.6) < 1e-12
    assert abs(m[1]["top_frac"] - 0.8) < 1e-12
    assert (m[2]["dup_frac"], m[2]["top_frac"]) == (0.0, 0.25)
    assert m[3]["n_tokens"] == 3  # whitespace runs collapse


def test_repetition_flags_thresholds(spark):
    m = repetition_metrics(_docs(spark), "doc_id", "text")
    f = {r["doc_id"]: r["flagged"] for r in repetition_flags(m, 0.5, 0.5).collect()}
    assert f == {1: True, 2: False, 3: False}


def test_redact_pii_counts_and_text(spark):
    df = spark.createDataFrame(
        [(1, "mail bob@x.io and sue@y.org or +1-555-0042 end"), (2, "clean")],
        "id long, t string",
    )
    out = {r["id"]: r for r in redact_pii(df, "t").collect()}
    assert (out[1]["n_emails"], out[1]["n_phones"]) == (2, 1)
    assert out[1]["redacted"] == "mail <EMAIL> and <EMAIL> or <PHONE> end"
    assert (out[2]["n_emails"], out[2]["n_phones"]) == (0, 0)
    assert out[2]["redacted"] == "clean"


def test_redaction_is_pure_projection(spark):
    """No shuffle: redaction must stay a per-row projection."""
    df = spark.range(10).withColumn("t", F.lit("a@b.co"))
    plan = redact_pii(df, "t")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_unigram_surprisal_exact_small_corpus(spark):
    from math import log

    from fugue_warehouses_spark.extensions.quality import unigram_surprisal

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    # corpus: a=2, b=2, c=1, total=5
    got = {r["doc_id"]: r for r in unigram_surprisal(df, "doc_id", "text").collect()}
    s_a, s_b, s_c = log(5 / 2), log(5 / 2), log(5 / 1)
    assert got[1]["n_tokens"] == 3
    assert abs(got[1]["mean_surprisal"] - (2 * s_a + s_b) / 3) < 1e-12
    assert abs(got[2]["mean_surprisal"] - (s_b + s_c) / 2) < 1e-12
    # rarer tokens -> higher surprisal
    assert got[2]["mean_surprisal"] > got[1]["mean_surprisal"]


def test_unigram_surprisal_vocab_broadcast(spark):
    from fugue_warehouses_spark.extensions.quality import unigram_surprisal

    df = spark.createDataFrame([(1, "x y z")], "doc_id long, text string")
    plan = (
        unigram_surprisal(df, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_redact_pii_mixed_case_and_long_phone(spark):
    df = spark.createDataFrame(
        [(1, "John.Doe@Example.COM or +1-555-123-4567")], "id long, t string"
    )
    r = redact_pii(df, "t").collect()[0]
    assert (r["n_emails"], r["n_phones"]) == (1, 1)
    assert r["redacted"] == "<EMAIL> or <PHONE>"


def test_quality_logit_scores_shape_and_sign(spark, sf_dir):
    """z's sign is the decision; prob is sigmoid(z); good prose scores
    above garbage."""
    import math

    import pytest

    from fugue_warehouses_spark.extensions.quality import (
        quality_logit_scores,
    )

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and the dog is in the house of a friend."),
            (2, ";;;;; ::: !!!! ????? ;;;"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in quality_logit_scores(docs, "text", keep_cols=("doc_id",)).collect()
    }
    for r in rows.values():
        assert r["prob"] == pytest.approx(1.0 / (1.0 + math.exp(-r["z"])))
    assert rows[1]["z"] > rows[2]["z"]
    assert rows[2]["prob"] < 0.5


def test_bigram_logprob_hand_checked(spark):
    import math

    from fugue_warehouses_spark.extensions.quality import bigram_logprob

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "x")],  # doc 3: no bigrams
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bigram_logprob(df, "doc_id", "text").collect()}
    # corpus bigrams: doc1: (a,b),(b,a),(a,b); doc2: (a,b)
    # c(a b)=3, c(b a)=1, c(a .)=3, c(b .)=1, V=|{a,b,x}|=3, k=0.5
    p_ab = math.log(3 + 0.5) - math.log(3 + 0.5 * 3)
    p_ba = math.log(1 + 0.5) - math.log(1 + 0.5 * 3)
    assert out[1]["n_bigrams"] == 3
    assert abs(out[1]["mean_logprob"] - (2 * p_ab + p_ba) / 3) < 1e-12
    assert out[2]["n_bigrams"] == 1
    assert abs(out[2]["mean_logprob"] - p_ab) < 1e-12
    assert 3 not in out, "single-token doc has no bigrams"


def test_bigram_logprob_ranks_garbled_below_natural(spark):
    from fugue_warehouses_spark.extensions.quality import bigram_logprob

    natural = "the cat sat on the mat and the cat sat on the mat again"
    garbled = "mat the on cat again sat the mat on the and cat sat the"
    df = spark.createDataFrame(
        [(1, natural), (2, natural), (3, garbled)],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["mean_logprob"]
        for r in bigram_logprob(df, "doc_id", "text").collect()
    }
    # same unigram mix, but the garbled doc's transitions are rarer
    assert out[3] < out[1]
