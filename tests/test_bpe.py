"""Distributed BPE training/encoding vs a plain-Python textbook BPE.

The Spark trainer and the DuckDB oracle both implement the merge with
the double-space replace trick; the reference here is the classic
position-walking implementation (Sennrich et al.) — agreement of all
three on random corpora is the evidence the string algebra is exactly
BPE (greedy left-to-right, self-overlap skipped)."""

from __future__ import annotations

import collections

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from fugue_warehouses_spark.extensions.bpe import (
    END,
    bpe_encode,
    bpe_train,
    bpe_train_sql,
)


def _ref_bpe(texts: list[str], n_merges: int):
    """Textbook BPE: position-walking merge, no string tricks."""
    wc = collections.Counter(t for x in texts for t in x.split())
    seqs = {w: tuple(list(w) + [END]) for w in wc}
    merges = []
    for step in range(n_merges):
        pc = collections.Counter()
        for w, f in wc.items():
            s = seqs[w]
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, f"{a} {b}", c))
        for w in seqs:
            s = seqs[w]
            out = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = tuple(out)
    return merges, seqs


_word = st.text(alphabet="abc", min_size=1, max_size=6)
_corpus = st.lists(
    st.lists(_word, min_size=1, max_size=8).map(" ".join),
    min_size=1,
    max_size=12,
)


@settings(max_examples=10, deadline=None)
@given(_corpus, st.integers(1, 6))
def test_trainer_matches_textbook_bpe(spark, texts, k):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    out, _ = bpe_train(df, "text", n_merges=k)
    got = [tuple(r) for r in out.orderBy("step").collect()]
    exp, _ = _ref_bpe(texts, k)
    assert got == exp


@settings(max_examples=6, deadline=None)
@given(_corpus, st.integers(1, 5))
def test_oracle_matches_textbook_bpe(texts, k):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?)", [(t,) for t in texts])
    got = [tuple(r) for r in con.execute(bpe_train_sql(k)).fetchall()]
    exp, _ = _ref_bpe(texts, k)
    assert got == exp


def test_self_overlap_pair_merges_alternately(spark):
    # 'aaaa' -> a a a a </w>; merging ('a','a') must give aa aa </w>
    df = spark.createDataFrame([("aaaa aaaa aaaa",)], "text string")
    out, merges = bpe_train(df, "text", n_merges=1)
    assert merges[0][0] == "a a"
    enc = bpe_encode(df, "text", merges).first()
    assert list(enc.bpe_tokens)[:3] == ["aa", "aa", END]


def test_encode_matches_reference_segmentation(spark):
    texts = ["low lower lowest", "low low newer newest", "wider new"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    _, merges = bpe_train(df, "text", n_merges=6)
    exp_merges, seqs = _ref_bpe(texts, 6)
    assert [(p, c) for _, p, c in exp_merges] == merges
    enc = bpe_encode(df, "text", merges).collect()
    for row, text in zip(enc, texts):
        exp_tokens = [t for w in text.split() for t in seqs[w]]
        assert list(row.bpe_tokens) == exp_tokens
        assert row.n_bpe_tokens == len(exp_tokens)


def test_sample_words_cap_and_guards(spark):
    df = spark.createDataFrame(
        [("low low low rare",)], "text string"
    )
    # cap to the single most frequent word: merges come from 'low' only
    out, merges = bpe_train(df, "text", n_merges=2, sample_words=1)
    assert all("r" not in p for p, _ in merges)
    with pytest.raises(ValueError):
        bpe_train(df, "text", n_merges=0)


def test_vocab_exhaustion_matches_between_all_three(spark):
    # single 1-char word: one merge ('a </w>') exhausts the vocab;
    # the oracle must emit ONE row and no NULLs (the pre-fix chain
    # NULL-poisoned seq and emitted a NULL step row)
    texts = ["a"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    out, merges = bpe_train(df, "text", n_merges=3)
    got = [tuple(r) for r in out.orderBy("step").collect()]
    exp, _ = _ref_bpe(texts, 3)
    assert got == exp == [(0, "a </w>", 1)]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (text VARCHAR)")
    con.execute("INSERT INTO documents VALUES ('a')")
    assert [tuple(r) for r in con.execute(bpe_train_sql(3)).fetchall()] == exp
    # encode oracle survives exhaustion too (no NULL poisoning)
    from fugue_warehouses_spark.extensions.bpe import bpe_encode_sql

    con2 = duckdb.connect()
    con2.execute("CREATE TABLE documents (text VARCHAR, source VARCHAR)")
    con2.execute("INSERT INTO documents VALUES ('a', 's')")
    rows = con2.execute(bpe_encode_sql(3)).fetchall()
    assert rows == [("s", 1, 1, 1, 1.0)]


@settings(max_examples=8, deadline=None)
@given(_corpus, st.integers(1, 6))
def test_local_fast_path_matches_distributed_chain(spark, texts, k):
    # round 12: bpe_train takes a bounded driver-local merge loop when
    # the vocab fits its budgets; forcing the budgets to 0 forces the
    # distributed per-step chain. The two must learn the IDENTICAL
    # merge table (same counts, same joined-pair-string tie-break).
    from fugue_warehouses_spark.plans import bounded

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    _, local = bpe_train(df, "text", n_merges=k)
    assert bounded.decisions["bpe_train_local"]["taken"] is True
    _, dist = bpe_train(
        df, "text", n_merges=k, local_merge_ops_below=0.0
    )
    assert bounded.decisions["bpe_train_local"]["taken"] is False
    assert local == dist


def test_encode_empty_doc_counts_zero_tokens(spark):
    df = spark.createDataFrame([("",), ("   ",), ("ab",)], "text string")
    out = bpe_encode(df, "text", [("a b", 0)]).collect()
    by_text = {r.text: r for r in out}
    assert by_text[""].n_bpe_tokens == 0 and list(by_text[""].bpe_tokens) == []
    assert by_text["   "].n_bpe_tokens == 0
    assert by_text["ab"].n_bpe_tokens == 2  # ab </w>
