"""CDC invariants: chunks exactly partition the text, shared passages
chunk identically regardless of offset (the point of content-defined
boundaries), and the dedup accounting matches hand counts."""

import pytest
from pyspark.sql import functions as F

from fugue_warehouses_spark.extensions import chunking as CH

_PASSAGE = (
    "content defined chunking cuts where the rolling hash of the text "
    "itself hits a sentinel value so identical passages always chunk "
    "the same way no matter where they start in the document at all"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "a", _PASSAGE),
        (1, "a", "PREFIX SHIFTING EVERYTHING BY SOME ODD AMOUNT " + _PASSAGE),
        (2, "b", "totally unrelated text with no shared passages inside"),
        (3, "b", "x"),  # shorter than the window: single whole-text chunk
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_chunks_partition_text(spark, docs):
    chunks = CH.cdc_chunks(docs, keep_cols=("source",))
    glued = (
        chunks.orderBy("doc_id", "chunk_idx")
        .groupBy("doc_id")
        .agg(F.concat_ws("", F.collect_list("chunk_text")).alias("glued"))
    )
    joined = glued.join(docs, "doc_id").collect()
    assert all(r["glued"] == r["text"] for r in joined)
    lens = chunks.groupBy("doc_id").agg(F.sum("chunk_len").alias("s")).collect()
    by_id = {r["doc_id"]: r["s"] for r in lens}
    for r in docs.collect():
        assert by_id[r["doc_id"]] == len(r["text"])


def test_offset_invariance(spark, docs):
    """Doc 1 is doc 0 with a prefix: all of doc 0's interior chunks
    must reappear verbatim among doc 1's chunks (boundaries re-sync
    within one expected-chunk-length of the splice)."""
    chunks = CH.cdc_chunks(docs)
    c0 = [r["chunk_text"] for r in chunks.filter("doc_id = 0").collect()]
    c1 = {r["chunk_text"] for r in chunks.filter("doc_id = 1").collect()}
    # ignore doc 0's first chunk (its start is the splice point) and
    # last chunk (end-of-text cut differs only if text lengths differ)
    shared = [c for c in c0[1:] if c in c1]
    assert len(shared) >= max(1, len(c0) - 2)


def test_short_doc_single_chunk(spark, docs):
    one = CH.cdc_chunks(docs).filter("doc_id = 3").collect()
    assert len(one) == 1
    assert one[0]["chunk_text"] == "x"
    assert one[0]["chunk_start"] == 1 and one[0]["chunk_len"] == 1


def test_dedup_stats_counts(spark, docs):
    chunks = CH.cdc_chunks(docs, keep_cols=("source",))
    stats = {
        r["source"]: r for r in CH.cdc_dedup_stats(chunks, "source").collect()
    }
    a, b = stats["a"], stats["b"]
    # source a holds a duplicated passage: dedup must find savings
    assert a["n_distinct_chunks"] < a["n_chunks"]
    assert a["distinct_chunk_chars"] < a["total_chunk_chars"]
    # source b has no repeats at all
    assert b["n_distinct_chunks"] == b["n_chunks"]
    assert b["distinct_chunk_chars"] == b["total_chunk_chars"]
    # char totals reconcile with the raw text volume
    total = sum(len(r["text"]) for r in docs.filter("source = 'a'").collect())
    assert a["total_chunk_chars"] == total


def test_expected_chunk_length(spark):
    """With divisor=64 the mean interior chunk length sits near 64;
    assert the loose 3x band (regression guard for the hash)."""
    import random

    rng = random.Random(7)
    text = "".join(rng.choice("abcdefgh ") for _ in range(20000))
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    chunks = CH.cdc_chunks(df, divisor=64).collect()
    mean = len(text) / len(chunks)
    assert 64 / 3 < mean < 64 * 3


def test_context_windows_exact_slices(spark):
    from fugue_warehouses_spark.extensions.chunking import context_windows

    df = spark.createDataFrame(
        [(1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), (2, "a b"), (3, "   ")],
        "doc_id long, text string",
    )
    out = {
        (r["doc_id"], r["win_idx"]): (r["n_tokens"], r["win_text"])
        for r in context_windows(df, window=4, stride=2).collect()
    }
    assert out[(1, 0)] == (4, "t0 t1 t2 t3")
    assert out[(1, 1)] == (4, "t2 t3 t4 t5")
    assert out[(1, 4)] == (2, "t8 t9")  # tail window, shorter
    assert out[(2, 0)] == (2, "a b")
    assert (3, 0) not in out, "empty doc yields no windows"
    assert max(i for d, i in out if d == 1) == 4
