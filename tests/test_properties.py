"""Property-based tests (hypothesis) — coverage the reference lacks
(SURVEY.md §5: no randomized testing anywhere in the reference repo).

Pure-python properties (schema codec) run with full example budgets;
Spark-executing properties use small budgets to keep the suite fast.
"""

from __future__ import annotations

import string

import pytest

from hypothesis import given, settings, strategies as st

from fugue_warehouses_spark.schema import parse_schema, struct_to_schema

_SIMPLE_TYPES = [
    "bool", "byte", "short", "int", "long", "float", "double",
    "str", "date", "datetime", "bytes",
]

_name = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=8)


def _type_strategy(depth=2):
    base = st.sampled_from(_SIMPLE_TYPES)
    if depth == 0:
        return base
    inner = _type_strategy(depth - 1)
    return st.one_of(
        base,
        inner.map(lambda t: f"[{t}]"),                      # array
        st.tuples(st.sampled_from(["str", "long"]), inner)  # map
        .map(lambda kv: f"<{kv[0]},{kv[1]}>"),
        st.lists(
            st.tuples(_name, inner), min_size=1, max_size=3,
            unique_by=lambda kv: kv[0],
        ).map(lambda fs: "{" + ",".join(f"{n}:{t}" for n, t in fs) + "}"),
        st.tuples(st.integers(1, 38), st.integers(0, 10))
        .filter(lambda ps: ps[1] <= ps[0])
        .map(lambda ps: f"decimal({ps[0]},{ps[1]})"),
    )


@st.composite
def _schema_strings(draw):
    n = draw(st.integers(1, 5))
    names = draw(
        st.lists(_name, min_size=n, max_size=n, unique=True)
    )
    types = [draw(_type_strategy()) for _ in range(n)]
    return ",".join(f"{nm}:{tp}" for nm, tp in zip(names, types))


@given(_schema_strings())
@settings(max_examples=200, deadline=None)
def test_schema_codec_roundtrip(schema_str):
    struct = parse_schema(schema_str)
    rendered = struct_to_schema(struct)
    # canonical fixed point: parse(render(parse(s))) == parse(s)
    assert parse_schema(rendered) == struct
    # and rendering is stable
    assert struct_to_schema(parse_schema(rendered)) == rendered


@given(
    st.lists(
        st.tuples(st.integers(-1000, 1000), st.floats(allow_nan=False,
                                                      allow_infinity=False,
                                                      width=32)),
        min_size=1, max_size=50,
    ),
    st.integers(1, 5),
)
@settings(max_examples=10, deadline=None)
def test_take_presort_matches_python_sort(spark, rows, n):
    """take(n, presort) == python sorted()[:n] on arbitrary data."""
    from fugue_warehouses_spark.operators.take import take

    df = spark.createDataFrame(
        [(i, a, float(b)) for i, (a, b) in enumerate(rows)],
        "id long, a long, b double",
    )
    got = [
        (r["a"], r["b"], r["id"])
        for r in take(df, n, presort="a desc, b asc, id asc").collect()
    ]
    expected = sorted(
        ((a, float(b), i) for i, (a, b) in enumerate(rows)),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:n]
    assert sorted(got) == sorted(expected)


@given(
    tgt=st.dictionaries(st.integers(0, 20), st.integers(-100, 100),
                        min_size=1, max_size=8),
    src=st.dictionaries(st.integers(0, 20), st.integers(-100, 100),
                        min_size=1, max_size=8),
)
@settings(max_examples=10, deadline=None)
def test_merge_into_matches_dict_semantics(spark, tgt, src):
    """MERGE == dict.update: result key set is the union, source wins
    on collisions, untouched target rows survive verbatim."""
    from fugue_warehouses_spark.engine import SparkWarehouseEngine

    eng = SparkWarehouseEngine(spark)
    t = spark.createDataFrame(list(tgt.items()), "k int, v int")
    s = spark.createDataFrame(list(src.items()), "k int, v int")
    out = {r.k: r.v for r in eng.merge_into(t, s, on=["k"]).native.collect()}
    expected = dict(tgt)
    expected.update(src)
    assert out == expected


@given(
    toks=st.lists(st.integers(0, 300), min_size=1, max_size=20),
    seq_len=st.integers(1, 512),
)
@settings(max_examples=10, deadline=None)
def test_pack_sequences_is_prefix_sum(spark, toks, seq_len):
    """Offsets are the exact prefix sums in order; seq ids are the
    floor-division of offsets and non-decreasing."""
    from fugue_warehouses_spark.extensions.packing import pack_sequences

    rows = [("s", i, n) for i, n in enumerate(toks)]
    df = spark.createDataFrame(rows, "src string, doc_id int, ntok int")
    got = {
        r.doc_id: (r._tok_offset, r.seq_id)
        for r in pack_sequences(df, "doc_id", "ntok", seq_len, ["src"]).collect()
    }
    acc = 0
    prev_seq = 0
    for i, n in enumerate(toks):
        assert got[i] == (acc, acc // seq_len)
        assert got[i][1] >= prev_seq
        prev_seq = got[i][1]
        acc += n


@given(
    keys=st.lists(st.integers(0, 10_000), min_size=1, max_size=60, unique=True),
    quota=st.integers(1, 10),
)
@settings(max_examples=10, deadline=None)
def test_stratified_sample_quota_and_subset(spark, keys, quota):
    from fugue_warehouses_spark.extensions.sampling import stratified_sample_exact

    rows = [(k % 3, k) for k in keys]
    df = spark.createDataFrame(rows, "stratum int, k int")
    out = [(r.stratum, r.k) for r in
           stratified_sample_exact(df, ["stratum"], quota, "k").collect()]
    assert set(out) <= set(rows)
    from collections import Counter
    per = Counter(s for s, _ in out)
    full = Counter(s for s, _ in rows)
    for s, n in full.items():
        assert per[s] == min(quota, n)


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=14
        ),
        min_size=1,
        max_size=8,
    ),
    window=st.integers(min_value=2, max_value=5),
)
@settings(max_examples=8, deadline=None)
def test_span_coverage_invariants(spark, docs, window):
    """dup_tokens <= total_tokens; a doc counted as having dups implies
    dup_tokens > 0; totals equal the raw token counts."""
    from fugue_warehouses_spark.extensions.dedup import duplicate_span_coverage

    rows = [(i, " ".join(toks), "s") for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = duplicate_span_coverage(df, window=window).collect()
    assert len(out) == 1
    r = out[0]
    assert 0 <= r["dup_tokens"] <= r["total_tokens"]
    assert r["n_docs"] == len(docs)
    assert r["total_tokens"] == sum(len(t) for t in docs)
    assert (r["n_docs_with_dup"] > 0) == (r["dup_tokens"] > 0)


@given(
    series=st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False),
        min_size=1,
        max_size=12,
    ),
    alpha=st.sampled_from([0.25, 0.5, 0.75, 1.0]),
)
@settings(max_examples=8, deadline=None)
def test_ewma_stays_within_series_range(spark, series, alpha):
    """EWMA is a convex combination of observations: result must lie in
    [min(x), max(x)] and equal the Python recurrence exactly."""
    from fugue_warehouses_spark.operators.timeseries import ewma_last

    rows = [
        (1, f"2024-01-01 00:{i:02d}:00", float(v))
        for i, v in enumerate(series)
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        rows, "user_id long, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = ewma_last(df, "user_id", "ts", "value", alpha).collect()[0]
    acc = series[0]
    for x in series[1:]:
        acc = alpha * x + (1.0 - alpha) * acc
    # Python's round() is banker's; Spark rounds HALF_UP — and over the
    # SHORTEST decimal representation of the double (Java
    # BigDecimal.valueOf goes through Double.toString), not its full
    # binary expansion: 0.7499975 rounds to 0.749998 even though the
    # stored double is 0.74999749999...x. repr() is Python's
    # shortest-round-trip form, the exact analog.
    from decimal import ROUND_HALF_UP, Decimal

    expect = float(
        Decimal(repr(acc)).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP
        )
    )
    assert got["ewma_value"] == expect
    lo, hi = min(series), max(series)
    assert lo - 1e-6 <= got["ewma_value"] <= hi + 1e-6


@given(
    n=st.integers(min_value=1, max_value=200),
    shards=st.integers(min_value=1, max_value=16),
)
@settings(max_examples=8, deadline=None)
def test_shard_assignment_total_and_range(spark, n, shards):
    from fugue_warehouses_spark.operators.layout import (
        shard_assignment,
        shard_manifest,
    )

    df = spark.range(0, n).withColumnRenamed("id", "k")
    m = shard_manifest(shard_assignment(df, "k", shards), "k").collect()
    assert sum(r["n_rows"] for r in m) == n
    assert all(0 <= r["shard"] < shards for r in m)


@given(
    st.integers(8, 28),
    st.integers(8, 28),
    st.booleans(),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=30, deadline=None)
def test_jpeg_progressive_baseline_identity_fuzz(h, w, gray, seed):
    """Pure-python codec property (round 8): progressive (SOF2)
    entropy-codes the same quantized coefficients as baseline across
    its multi-scan script, so decode(progressive(x)) must equal
    decode(baseline(x)) BIT-EXACTLY for arbitrary images — dims
    straddling block boundaries, grayscale and RGB, arbitrary
    content."""
    import numpy as np

    from fugue_warehouses_spark.extensions import jpeg as J

    rng = np.random.default_rng(seed)
    shape = (h, w) if gray else (h, w, 3)
    # mix smooth + noise so blocks span long-zero-run and busy regimes
    base = (np.indices((h, w)).sum(0) * (seed % 7 + 1)) % 256
    img = base[..., None].repeat(3, -1) if not gray else base
    img = np.clip(
        img + rng.normal(0, seed % 90, shape), 0, 255
    ).astype(np.uint8)
    assert np.array_equal(
        J.decode_jpeg(J.encode_jpeg(img)),
        J.decode_jpeg(J.encode_jpeg_progressive(img)),
    )


@given(
    st.lists(
        # case-stable alphabet: ASCII + uncased CJK/emoji — JVM and
        # Python case-folding agree here; case-exotic codepoints
        # (Turkish dotted I, ligatures) fold differently per engine
        # and are out of scope for the n-gram arithmetic under test
        st.text(
            alphabet="abcz019.,;!\u4e2d\u6587\U0001f600\U0001f4a9",
            min_size=1,
            max_size=8,
        ),
        min_size=0,
        max_size=30,
    ),
    st.integers(1, 6),
    st.sampled_from([" ", "  ", "\t", " \n "]),
)
@settings(max_examples=15, deadline=None)
def test_word_ngrams_matches_python_reference(spark, toks, n, sep):
    """word_ngrams (round-10 slice+zip_with rewrite) == the obvious
    Python sliding window, on arbitrary unicode tokens, any order n,
    and messy separators — including docs shorter than n (empty
    result) and empty docs. Guards the offset-pairing arithmetic
    beyond the oracle's fixed-corpus coverage."""
    from fugue_warehouses_spark.extensions.contamination import word_ngrams

    text = sep.join(toks)
    df = spark.createDataFrame([(text,)], "text string")
    got = df.select(word_ngrams("text", n).alias("g")).first()["g"]
    low = [t.lower() for t in text.split() if t]
    want = [" ".join(low[i:i + n]) for i in range(len(low) - n + 1)]
    assert list(got) == want


@given(
    st.lists(
        st.text(alphabet="abcdef", min_size=1, max_size=5),
        min_size=0,
        max_size=25,
    ),
    st.integers(1, 4),
)
@settings(max_examples=15, deadline=None)
def test_hashed_tokens_gram_stream_matches_python_reference(
    spark, toks, ngram_max
):
    """sampling._hashed_tokens emits exactly the 1..ngram_max gram
    multiset (hashed); compare BUCKET MULTISETS against a Python
    reference using the same md5-prefix convention — pins the chained
    zip_with construction for every order, not just the benched
    bigram."""
    import hashlib

    from fugue_warehouses_spark.extensions import sampling as SA

    text = " ".join(toks)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    from pyspark.sql import functions as _F

    out = SA._hashed_tokens(df, "text", 4096, _F.col("doc_id"),
                            ngram_max=ngram_max)
    got = sorted(r["__b"] for r in out.collect())

    def bucket(g: str) -> int:
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % 4096

    words = [t for t in text.split() if t]
    want = []
    for k in range(1, ngram_max + 1):
        want += [
            bucket(" ".join(words[i:i + k]))
            for i in range(len(words) - k + 1)
        ]
    assert got == sorted(want)


def _long_docs(spark):
    """8 docs x 20k tokens — big enough that an O(tokens²) kernel
    needs minutes while the linear forms need well under a second of
    kernel time (>30x margin against host noise in both directions)."""
    from pyspark.sql import functions as F

    return spark.range(8).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(19_999)),
                lambda i: F.concat(
                    F.lit("w"), ((F.col("id") * 31 + i) % 5000).cast("string")
                ),
            ),
            " ",
        ).alias("text"),
    ).localCheckpoint()


def _canary_word_ngrams(spark, docs):
    from pyspark.sql import functions as F

    from fugue_warehouses_spark.extensions.contamination import word_ngrams

    got = docs.select(
        F.size(word_ngrams("text", 5)).alias("k")
    ).agg(F.sum("k")).first()[0]
    assert got == 8 * (20_000 - 4)


def _canary_hashed_tokens_bigram(spark, docs):
    from pyspark.sql import functions as F

    from fugue_warehouses_spark.extensions.sampling import _hashed_tokens

    got = _hashed_tokens(
        docs, "text", 4096, F.col("doc_id"), ngram_max=2
    ).count()
    assert got == 8 * (20_000 + 19_999)


def _canary_char_ngrams(spark, docs):
    from pyspark.sql import functions as F

    from fugue_warehouses_spark.functions.text import char_ngrams

    row = docs.select(
        F.size(char_ngrams("text", 5)).alias("k"),
        F.length("text").alias("n"),
    ).agg(F.sum("k").alias("k"), F.sum("n").alias("n")).first()
    # the kernel dedups (array_distinct), so the invariant is a
    # sandwich: >0 per doc, and never more than the len-n+1 positions
    assert 8 < row["k"] <= row["n"] - 8 * 4


def _canary_chunk_text_tokens_col(spark, docs):
    from pyspark.sql import functions as F

    from fugue_warehouses_spark.functions.text import chunk_text, tokens

    # the long-document contract: pass a MATERIALIZED token array so
    # the strided windows never re-split the text per window start
    with_toks = docs.withColumn("__toks", tokens("text"))
    got = with_toks.select(
        F.explode(
            chunk_text("text", chunk_tokens=512, overlap=64,
                       tokens_col=F.col("__toks"))
        )
    ).count()
    assert got >= 8 * (20_000 // 512)


def _canary_quality_kernels(spark, docs):
    from pyspark.sql import functions as F

    from fugue_warehouses_spark.functions.text import (
        bpe_token_estimate,
        fingerprint,
        quality_score,
    )

    row = docs.select(
        quality_score("text").alias("q"),
        bpe_token_estimate("text").alias("b"),
        fingerprint("text").alias("fp"),
    ).agg(
        F.sum("q").alias("q"),
        F.sum("b").alias("b"),
        F.countDistinct("fp").alias("f"),
    ).first()
    assert 0.0 <= row["q"] <= 8.0 and row["b"] > 0 and row["f"] == 8


def _canary_minhash_signing(spark, docs):
    from fugue_warehouses_spark.extensions.dedup import build_minhash_index

    sig = build_minhash_index(docs, "doc_id", "text")
    assert sig.count() == 8


def _canary_decontaminate_spans(spark, docs):
    from pyspark.sql import functions as F

    from fugue_warehouses_spark.extensions.contamination import (
        decontaminate_spans,
    )

    # the cyclic token sequences share every consecutive 5-gram, so
    # probe = doc 0 FULLY covers all other docs — the worst case for
    # the reconstruction step (covered == every position; the
    # filter-with-array_contains form would pay O(len²) per doc here)
    probes = docs.filter(F.col("doc_id") == 0).select("text")
    corpus = docs.filter(F.col("doc_id") > 0)
    row = (
        decontaminate_spans(corpus, probes, n=5)
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("removed_tokens").alias("removed"),
            F.sum(F.length("clean_text")).alias("left"),
        )
        .first()
    )
    assert row["docs"] == 7 and row["removed"] == 7 * 20_000
    assert row["left"] == 0


def _canary_bpe_encode(spark, docs):
    from pyspark.sql import functions as F

    from fugue_warehouses_spark.extensions.bpe import bpe_encode

    # fixed 4-merge table; the encode is a per-merge literal-replace
    # chain over the symbolized text (~340 KB/doc here) — linear per
    # merge; a per-position form would be O(len^2)
    merges = [("w 1", 0), ("w 2", 0), ("1 </w>", 0), ("w1 </w>", 0)]
    row = (
        bpe_encode(docs, "text", merges)
        .agg(
            F.sum("n_bpe_tokens").alias("k"),
            F.sum(F.size(F.split(F.col("text"), " "))).alias("words"),
        )
        .first()
    )
    # sandwich: at least one symbol per word, at most all unmerged
    # symbols (word chars + </w> each)
    assert row["k"] >= row["words"]
    assert row["k"] <= 8 * 20_000 * 6


_LONG_DOC_CANARIES = [
    ("word_ngrams", _canary_word_ngrams),
    ("hashed_tokens_bigram", _canary_hashed_tokens_bigram),
    ("char_ngrams", _canary_char_ngrams),
    ("chunk_text_tokens_col", _canary_chunk_text_tokens_col),
    ("quality_kernels", _canary_quality_kernels),
    ("minhash_signing", _canary_minhash_signing),
    ("decontaminate_spans", _canary_decontaminate_spans),
    ("bpe_encode", _canary_bpe_encode),
]


@pytest.mark.parametrize(
    "name,case", _LONG_DOC_CANARIES, ids=[n for n, _ in _LONG_DOC_CANARIES]
)
def test_text_kernels_are_linear_in_document_length_canary(
    spark, name, case
):
    """Long-document perf canary, parametrized over every
    text-kernel family the round-10 inlining sweep audited (round 11,
    VERDICT r10 next #8). The fixtures' ~250-token docs hid an
    O(tokens²) n-gram construction behind the scheduling floor for
    nine rounds — at 10k tokens it was 114x (127 s for 128 docs).
    Each case runs one kernel family on 8 docs x 20k tokens under a
    30 s budget and checks a count invariant: the linear forms finish
    in well under a second of kernel time, a quadratic form needs
    minutes. If a case ever fails on time, someone reintroduced
    per-element evaluation of a row expression inside a higher-order
    function (see contamination.word_ngrams docstring); fix the
    kernel, don't raise the budget."""
    import time

    docs = _long_docs(spark)
    t0 = time.perf_counter()
    case(spark, docs)
    took = time.perf_counter() - t0
    assert took < 30, (
        f"{name} took {took:.1f}s on 8x20k-token docs — linear forms "
        "need <1s of kernel time; an O(tokens²) per-element "
        "evaluation has likely been reintroduced"
    )


@given(
    st.lists(st.integers(0, 12), min_size=1, max_size=30),
    st.integers(1, 3),
)
@settings(max_examples=8, deadline=None)
def test_compact_survivors_idempotent_under_random_replays(
    spark, tmp_path_factory, ids, n_replays
):
    """compact_survivors on ANY replay pattern (random id multisets,
    1-3 whole-log re-appends) leaves exactly one row per id with its
    original payload, and compacting twice is a no-op."""
    from fugue_warehouses_spark.streaming import compact_survivors

    path = str(tmp_path_factory.mktemp("kept") / "log")
    rows = [(i, f"payload-{i}") for i in ids]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.write.parquet(path)
    for _ in range(n_replays):
        spark.read.parquet(path).write.mode("append").parquet(path)

    out = sorted(map(tuple, compact_survivors(spark, path).collect()))
    want = sorted({(i, f"payload-{i}") for i in ids})
    assert out == want
    # idempotent: a second compaction changes nothing
    again = sorted(map(tuple, compact_survivors(spark, path).collect()))
    assert again == want


@given(
    st.lists(  # corpus docs as token lists over a tiny vocab so probe
        st.lists(  # overlap actually happens at n=2
            st.sampled_from(["aa", "Bb", "cc", "dd", "EE"]),
            min_size=0,
            max_size=12,
        ),
        min_size=1,
        max_size=8,
    ),
    st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
            min_size=0,
            max_size=8,
        ),
        min_size=1,
        max_size=3,
    ),
    st.integers(2, 3),
)
@settings(max_examples=10, deadline=None)
def test_decontaminate_spans_matches_python_reference(
    spark, corpus_toks, probe_toks, n
):
    """decontaminate_spans == the obvious Python span surgery: mark
    every token position covered by a lowercased n-gram shared with
    the probe set, drop those positions, rejoin the rest — on random
    tiny-vocab corpora where overlaps, overlapping windows, full
    removals and case differences all occur. Output rows only for
    contaminated docs; raw case preserved in survivors."""
    from fugue_warehouses_spark.extensions.contamination import (
        decontaminate_spans,
    )

    corpus = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(corpus_toks)],
        "doc_id long, text string",
    )
    probes = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(probe_toks)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_tokens, r.removed_tokens, r.clean_text)
        for r in decontaminate_spans(corpus, probes, n=n).collect()
    }

    probe_grams = set()
    for t in probe_toks:
        low = [x.lower() for x in t]
        probe_grams |= {
            " ".join(low[i:i + n]) for i in range(len(low) - n + 1)
        }
    want = {}
    for i, t in enumerate(corpus_toks):
        low = [x.lower() for x in t]
        covered = set()
        for s in range(len(low) - n + 1):
            if " ".join(low[s:s + n]) in probe_grams:
                covered |= set(range(s, s + n))
        if covered:
            clean = " ".join(
                tok for p, tok in enumerate(t) if p not in covered
            )
            want[i] = (len(t), len(covered), clean)
    assert got == want
