from pyspark.sql import functions as F

from fugue_warehouses_spark.functions import text as X


def _one(spark, s, col):
    df = spark.createDataFrame([(s,)], "t string")
    return df.select(col.alias("v")).collect()[0]["v"]


def test_token_and_char_count(spark):
    assert _one(spark, "a b  c", X.token_count("t")) == 3
    assert _one(spark, "   ", X.token_count("t")) == 0
    assert _one(spark, "abc", X.char_count("t")) == 3


def test_punct_ratio(spark):
    assert _one(spark, "ab..", X.punct_ratio("t")) == 0.5
    assert _one(spark, "abcd", X.punct_ratio("t")) == 0.0


def test_stopword_ratio(spark):
    v = _one(spark, "the cat and dog", X.stopword_ratio("t"))
    assert abs(v - 0.5) < 1e-9


def test_mean_token_length(spark):
    assert _one(spark, "ab abcd", X.mean_token_length("t")) == 3.0


def test_quality_score_bounds(spark):
    good = " ".join(["the quick brown fox jumps of a to in is"] * 4)
    assert _one(spark, good, X.quality_score("t")) == 1.0
    assert _one(spark, "x", X.quality_score("t")) < 0.5


def test_lang_id(spark):
    assert _one(spark, "the cat and of to", X.lang_id("t")) == "en"
    assert _one(spark, "der hund und die katze", X.lang_id("t")) == "de"
    assert _one(spark, "xyz qqq", X.lang_id("t")) == "und"


def test_fingerprint_normalizes_ws_and_case(spark):
    a = _one(spark, "  Hello   World ", X.fingerprint("t"))
    b = _one(spark, "hello world", X.fingerprint("t"))
    assert a == b and len(a) == 32


def test_char_ngrams(spark):
    grams = _one(spark, "abcd", X.char_ngrams("t", 3))
    assert sorted(grams) == ["abc", "bcd"]
    # shorter than n -> single truncated gram
    grams2 = _one(spark, "ab", X.char_ngrams("t", 3))
    assert grams2 == ["ab"]
