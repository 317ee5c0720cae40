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


def test_chunk_text_window_arithmetic(spark):
    from pyspark.sql import functions as F

    from fugue_warehouses_spark.functions.text import chunk_text

    text = " ".join(f"w{i}" for i in range(100))
    df = spark.createDataFrame([(text,), ("",), ("one",)], "text string")
    out = df.select(chunk_text("text", chunk_tokens=10, overlap=4).alias("c"))
    rows = [r["c"] for r in out.collect()]
    # 100 tokens, step 6: ceil((100-4)/6) = 16 chunks; first covers w0..w9
    assert len(rows[0]) == 16
    assert rows[0][0] == " ".join(f"w{i}" for i in range(10))
    assert rows[0][1].startswith("w6 ")
    assert rows[0][-1].split()[-1] == "w99"  # tail covered
    assert rows[1] == [""]  # empty doc -> one empty chunk
    assert rows[2] == ["one"]


def test_chunk_text_rejects_bad_overlap(spark):
    import pytest

    from fugue_warehouses_spark.functions.text import chunk_text

    with pytest.raises(ValueError):
        chunk_text("text", chunk_tokens=8, overlap=8)


def test_bm25_ranking_properties(spark):
    from fugue_warehouses_spark.extensions.retrieval import bm25_scores
    import pytest

    df = spark.createDataFrame(
        [
            (1, "rare common common filler words here"),
            (2, "common common common filler words here"),
            (3, "nothing matching at all in this one"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["score"] for r in
           bm25_scores(df, "doc_id", "text", ["rare", "common"]).collect()}
    assert 3 not in got                      # no matching term, no row
    assert got[1] > got[2]                   # rare term beats extra tf of common
    assert all(s > 0 for s in got.values())
    with pytest.raises(ValueError, match="non-empty"):
        bm25_scores(df, "doc_id", "text", [])


def test_tfidf_keywords_ranks_distinctive_terms(spark):
    from fugue_warehouses_spark.extensions.retrieval import tfidf_keywords

    rows = [
        ("a", "shared shared unique_a unique_a unique_a"),
        ("b", "shared shared unique_b"),
        ("c", "shared other other"),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    out = tfidf_keywords(df, "source", "text", k=2).collect()
    top = {}
    for r in out:
        top.setdefault(r["source"], []).append((r["token"], r["score"]))
    # group-unique terms outrank the corpus-wide 'shared' (idf = ln(1) = 0)
    assert top["a"][0][0] == "unique_a"
    assert top["b"][0][0] == "unique_b"
    assert all(s == 0.0 for g in top.values() for t, s in g if t == "shared")


def test_chunk_text_accepts_materialized_tokens_column(spark):
    """tokens_col (round 10): the long-document escape hatch for the
    per-chunk re-tokenization hazard — chunks built from a
    pre-materialized token array must be identical to the inline
    form."""
    from fugue_warehouses_spark.functions.text import chunk_text, tokens

    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(25))), (2, "one two"), (3, "")],
        "id long, text string",
    )
    inline = df.select(
        "id", chunk_text("text", chunk_tokens=10, overlap=4).alias("c")
    )
    # the barrier pattern: project the token array, checkpoint, chunk
    mat = df.select("id", "text", tokens("text").alias("__ts")).localCheckpoint()
    from pyspark.sql import functions as F

    via_col = mat.select(
        "id",
        chunk_text(
            "text", chunk_tokens=10, overlap=4, tokens_col=F.col("__ts")
        ).alias("c"),
    )
    assert sorted(map(tuple, inline.collect())) == sorted(
        map(tuple, via_col.collect())
    )
