"""Unit tests: sequence packing, deterministic sampling, MERGE upsert."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from fugue_warehouses_spark.engine import SparkWarehouseEngine
from fugue_warehouses_spark.extensions.packing import pack_sequences
from fugue_warehouses_spark.extensions.sampling import (
    hash_threshold_sample,
    stratified_sample_exact,
)


# ---- pack_sequences -------------------------------------------------


def test_pack_sequences_tape_layout(spark):
    df = spark.createDataFrame(
        [("a", 1, 300), ("a", 2, 300), ("a", 3, 100), ("b", 1, 600)],
        "src string, doc_id int, ntok int",
    )
    out = pack_sequences(
        df, "doc_id", "ntok", seq_len=512, partition_cols=["src"]
    )
    rows = {(r.src, r.doc_id): (r._tok_offset, r.seq_id) for r in out.collect()}
    # a: offsets 0, 300, 600 -> seqs 0, 0, 1; b restarts its own tape
    assert rows[("a", 1)] == (0, 0)
    assert rows[("a", 2)] == (300, 0)
    assert rows[("a", 3)] == (600, 1)
    assert rows[("b", 1)] == (0, 0)


def test_pack_sequences_rejects_global_sort(spark):
    df = spark.createDataFrame([Row(doc_id=1, ntok=5)])
    with pytest.raises(ValueError, match="shard key"):
        pack_sequences(df, "doc_id", "ntok", seq_len=10)
    assert (
        pack_sequences(df, "doc_id", "ntok", seq_len=10, allow_global=True).count()
        == 1
    )


def test_pack_sequences_oversized_doc_owns_multiple_seqs(spark):
    # a doc longer than seq_len: the NEXT doc starts in a later sequence
    df = spark.createDataFrame(
        [("a", 1, 1200), ("a", 2, 10)], "src string, doc_id int, ntok int"
    )
    out = {r.doc_id: r.seq_id for r in pack_sequences(
        df, "doc_id", "ntok", 512, ["src"]).collect()}
    assert out == {1: 0, 2: 2}  # 1200 tokens span seqs 0-2; doc 2 starts at 1200


# ---- deterministic sampling ----------------------------------------


def test_stratified_sample_layout_independent(spark):
    df = spark.range(0, 1000).select(
        (F.col("id") % 5).alias("stratum"), F.col("id").alias("k")
    )
    a = {(r.stratum, r.k) for r in stratified_sample_exact(df, ["stratum"], 7, "k").collect()}
    b = {
        (r.stratum, r.k)
        for r in stratified_sample_exact(
            df.repartition(17, "k"), ["stratum"], 7, "k"
        ).collect()
    }
    assert a == b and len(a) == 35


def test_stratified_sample_small_stratum_returns_all(spark):
    df = spark.createDataFrame(
        [("x", 1), ("x", 2), ("y", 3)], "s string, k int"
    )
    out = stratified_sample_exact(df, ["s"], 10, "k")
    assert out.count() == 3


def test_hash_threshold_sample_deterministic_and_unbiased(spark):
    df = spark.range(0, 10_000).withColumnRenamed("id", "k")
    s1 = {r.k for r in hash_threshold_sample(df, "k", 0.25).collect()}
    s2 = {r.k for r in hash_threshold_sample(df.repartition(13), "k", 0.25).collect()}
    assert s1 == s2
    assert 0.2 < len(s1) / 10_000 < 0.3  # uniform draw near the target rate
    # monotone: a smaller fraction is a subset of a larger one
    s_small = {r.k for r in hash_threshold_sample(df, "k", 0.1).collect()}
    assert s_small <= s1


# ---- merge_into -----------------------------------------------------


@pytest.fixture
def target(spark):
    return spark.createDataFrame(
        [(1, "alice", 10.0), (2, "bob", 20.0), (3, "carol", 30.0)],
        "k int, name string, bal double",
    )


def test_merge_update_insert_keep(spark, target):
    eng = SparkWarehouseEngine(spark)
    src = spark.createDataFrame([(2, 99.0), (4, 44.0)], "k int, bal double")
    out = eng.merge_into(target, src, on=["k"], action_col="act")
    rows = {r.k: (r.name, r.bal, r.act) for r in out.native.collect()}
    assert rows[1] == ("alice", 10.0, "keep")
    assert rows[2] == ("bob", 99.0, "update")
    assert rows[3] == ("carol", 30.0, "keep")
    assert rows[4] == (None, 44.0, "insert")


def test_merge_no_insert_is_left_join(spark, target):
    eng = SparkWarehouseEngine(spark)
    src = spark.createDataFrame([(2, 99.0), (4, 44.0)], "k int, bal double")
    out = eng.merge_into(target, src, on=["k"], insert_unmatched=False)
    rows = {r.k: r.bal for r in out.native.collect()}
    assert rows == {1: 10.0, 2: 99.0, 3: 30.0}


def test_merge_validates_columns(spark, target):
    eng = SparkWarehouseEngine(spark)
    src = spark.createDataFrame([(2, 99.0)], "wrong int, bal double")
    with pytest.raises(ValueError, match="key columns"):
        eng.merge_into(target, src, on=["k"])
    src2 = spark.createDataFrame([(2, 99.0)], "k int, nosuch double")
    with pytest.raises(ValueError, match="update columns"):
        eng.merge_into(target, src2, on=["k"], update_cols=["nosuch"])


# ---- contamination --------------------------------------------------


def test_word_ngrams_and_contamination(spark):
    from fugue_warehouses_spark.extensions.contamination import (
        contaminated_doc_ids,
        word_ngrams,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "a totally different sentence with no overlap here at all"),
            (3, "short text"),
        ],
        "doc_id int, text string",
    )
    grams = docs.select("doc_id", F.size(word_ngrams("text", 5)).alias("k")).collect()
    by_id = {r.doc_id: r.k for r in grams}
    assert by_id == {1: 5, 2: 6, 3: 0}  # len-n+1 grams; short docs yield none

    probes = spark.createDataFrame(
        [(100, "he said the quick brown fox jumps indeed")], "doc_id int, text string"
    )
    hits = {r.doc_id for r in contaminated_doc_ids(docs, probes).collect()}
    assert hits == {1}
    # hashed and exact gram joins agree
    hits_exact = {
        r.doc_id
        for r in contaminated_doc_ids(docs, probes, hash_grams=False).collect()
    }
    assert hits_exact == hits


def test_decontaminate_spans(spark):
    from fugue_warehouses_spark.extensions.contamination import (
        decontaminate_spans,
    )

    corpus = spark.createDataFrame(
        [
            # matches probe's "the quick brown fox jumps" at positions
            # 0-4 despite the case difference; raw case survives in the
            # reconstructed tail
            (1, "The QUICK brown fox JUMPS over the lazy dog"),
            (2, "a totally different sentence with no overlap here at all"),
            (3, "short text"),
            # every position covered -> empty clean text
            (4, "the quick brown fox jumps"),
        ],
        "doc_id int, text string",
    )
    probes = spark.createDataFrame(
        [(100, "he said the quick brown fox jumps indeed")],
        "doc_id int, text string",
    )
    out = {
        r.doc_id: r
        for r in decontaminate_spans(corpus, probes, n=5).collect()
    }
    # only contaminated docs are returned
    assert set(out) == {1, 4}
    assert out[1].n_tokens == 9 and out[1].removed_tokens == 5
    assert out[1].clean_text == "over the lazy dog"
    assert out[4].n_tokens == 5 and out[4].removed_tokens == 5
    assert out[4].clean_text == ""
    # hashed and exact gram matching agree on the full surgery
    exact = {
        r.doc_id: r
        for r in decontaminate_spans(
            corpus, probes, n=5, hash_grams=False
        ).collect()
    }
    assert {k: (v.removed_tokens, v.clean_text) for k, v in out.items()} == {
        k: (v.removed_tokens, v.clean_text) for k, v in exact.items()
    }


# ---- quantization ---------------------------------------------------


def test_quantize_int8_roundtrip_and_error_bound(spark, sf_dir):
    from fugue_warehouses_spark.extensions.quantization import (
        dequantize,
        quantize_int8,
        quantized_dot,
    )
    from fugue_warehouses_spark.functions.vectors import cosine

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(50)
    q = quantize_int8(emb)
    # storage type is tinyint (1 byte/dim = 4x smaller than float32)
    assert dict(q.dtypes)["qv"] == "array<tinyint>"
    # per-element reconstruction error <= scale/2 by construction
    err = q.select(
        F.max(
            F.array_max(
                F.zip_with(
                    "embedding",
                    dequantize("qv", "q_scale"),
                    lambda a, b: F.abs(a - b) / F.col("q_scale"),
                )
            )
        ).alias("m")
    ).collect()[0].m
    assert err <= 0.5 + 1e-9

    # quantized cosine tracks exact cosine within ~2% at 128 dims
    a = q.alias("a")
    b = q.alias("b")
    pairs = a.join(b, F.col("a.vec_id") < F.col("b.vec_id")).limit(500)
    qd = quantized_dot(
        F.col("a.qv"), F.col("a.q_scale"), F.col("b.qv"), F.col("b.q_scale")
    )
    na = F.sqrt(F.aggregate(F.col("a.embedding"), F.lit(0.0), lambda s, x: s + x * x))
    nb = F.sqrt(F.aggregate(F.col("b.embedding"), F.lit(0.0), lambda s, x: s + x * x))
    stats = pairs.select(
        F.max(
            F.abs(qd / (na * nb) - cosine(F.col("a.embedding"), F.col("b.embedding")))
        ).alias("max_err")
    ).collect()[0]
    assert stats.max_err < 0.02


def test_merge_null_keys_never_match(spark, target):
    """SQL MERGE semantics: a null key joins nothing — a null-key
    source row inserts (not 'keep'-with-junk), a null-key target row
    survives untouched."""
    eng = SparkWarehouseEngine(spark)
    t = target.union(
        spark.createDataFrame([(None, "ghost", 7.0)], "k int, name string, bal double")
    )
    s = spark.createDataFrame([(None, 55.0), (1, 11.0)], "k int, bal double")
    out = eng.merge_into(t, s, on=["k"], action_col="act")
    rows = [(r.k, r.name, r.bal, r.act) for r in out.native.collect()]
    assert (1, "alice", 11.0, "update") in rows
    assert (None, "ghost", 7.0, "keep") in rows    # null-key target kept
    assert (None, None, 55.0, "insert") in rows    # null-key source inserts
    assert len(rows) == 5


def test_weighted_mixture_rates_and_determinism(spark):
    from fugue_warehouses_spark.extensions.sampling import weighted_mixture

    df = spark.range(0, 9_000).select(
        (F.col("id") % 3).cast("string").alias("dom"), F.col("id").alias("k")
    )
    out = weighted_mixture(df, "dom", {"0": 0.5, "1": 1.0}, "k", default_rate=0.0)
    per = {r.dom: r.n for r in out.groupBy("dom").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert 0.4 < per["0"] / 3000 < 0.6     # ~half of domain 0
    assert per["1"] == 3000                 # all of domain 1
    assert "2" not in per                   # none of the default domain
    # layout-independent
    a = {r.k for r in out.collect()}
    b = {r.k for r in weighted_mixture(
        df.repartition(11), "dom", {"0": 0.5, "1": 1.0}, "k").collect()}
    assert a == b
    import pytest as _pt
    with _pt.raises(ValueError, match="rate"):
        weighted_mixture(df, "dom", {"0": 1.5}, "k")


def test_weighted_bernoulli_sample_tracks_weight(spark):
    from fugue_warehouses_spark.extensions.sampling import (
        weighted_bernoulli_sample,
    )

    df = spark.range(0, 8_000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 2 == 0, 0.25).otherwise(2.0).alias("w"),
    )
    out = weighted_bernoulli_sample(df, "k", "w", rate_per_unit=1.0)
    rows = out.collect()
    heavy = sum(1 for r in rows if r["w"] == 2.0)
    light = sum(1 for r in rows if r["w"] == 0.25)
    assert heavy == 4_000                  # rate capped at 1.0 -> all kept
    assert 0.20 < light / 4_000 < 0.30     # ~25% of the light rows
    # layout-independent: same kept set after repartition
    again = {
        r["k"]
        for r in weighted_bernoulli_sample(
            df.repartition(13), "k", "w", rate_per_unit=1.0
        ).collect()
    }
    assert {r["k"] for r in rows} == again
    import pytest as _pt

    with _pt.raises(ValueError, match="positive"):
        weighted_bernoulli_sample(df, "k", "w", rate_per_unit=0)


def test_weighted_bernoulli_sample_no_shuffle(spark):
    from fugue_warehouses_spark.extensions.sampling import (
        weighted_bernoulli_sample,
    )

    df = spark.range(100).select(F.col("id").alias("k"), F.lit(0.5).alias("w"))
    plan = (
        weighted_bernoulli_sample(df, "k", "w", 1.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_alpha_flatten_sample_rates_and_determinism(spark):
    from fugue_warehouses_spark.extensions.sampling import alpha_flatten_sample

    rows = (
        [(i, "big") for i in range(4000)]
        + [(i + 10_000, "mid") for i in range(1000)]
        + [(i + 20_000, "small") for i in range(250)]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = alpha_flatten_sample(df, "lang", "doc_id", alpha=0.5)
    counts = {
        r["lang"]: r["n"]
        for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    # smallest domain anchors at rate 1 (every row kept)
    assert counts["small"] == 250
    # expected rates: mid sqrt(250/1000)=0.5, big sqrt(250/4000)=0.25
    assert abs(counts["mid"] / 1000 - 0.5) < 0.06
    assert abs(counts["big"] / 4000 - 0.25) < 0.04
    # deterministic: same rows regardless of partitioning
    ids_a = sorted(r["doc_id"] for r in kept.collect())
    ids_b = sorted(
        r["doc_id"]
        for r in alpha_flatten_sample(
            df.repartition(17), "lang", "doc_id", alpha=0.5
        ).collect()
    )
    assert ids_a == ids_b
    # alpha=1 keeps the natural mixture (everything)
    assert alpha_flatten_sample(df, "lang", "doc_id", alpha=1.0).count() == len(rows)


def test_alpha_flatten_sample_null_domain_kept(spark):
    from fugue_warehouses_spark.extensions.sampling import alpha_flatten_sample

    df = spark.createDataFrame(
        [(1, "en"), (2, "en"), (3, None), (4, None)],
        "doc_id long, lang string",
    )
    kept = alpha_flatten_sample(df, "lang", "doc_id", alpha=1.0)
    # alpha=1 keeps the natural mixture INCLUDING NULL-domain rows
    assert kept.count() == 4
    assert kept.filter("lang IS NULL").count() == 2


def test_epoch_shuffle_is_deterministic_permutation(spark):
    """Each epoch's positions are a 1..n permutation, orders differ
    across epochs, and the whole thing is a pure function of
    (key, epoch) — identical under a different physical layout."""
    from fugue_warehouses_spark.extensions.sampling import epoch_shuffle

    df = spark.range(500).withColumnRenamed("id", "doc_id")
    out = epoch_shuffle(df, "doc_id", epochs=3).collect()
    by_epoch: dict = {}
    for r in out:
        by_epoch.setdefault(r["epoch"], {})[r["doc_id"]] = r["position"]
    assert set(by_epoch) == {0, 1, 2}
    for e, m in by_epoch.items():
        assert sorted(m.values()) == list(range(1, 501)), e
    # epochs are differently ordered (astronomically unlikely to match)
    assert by_epoch[0] != by_epoch[1]
    # physical-layout independence
    out2 = epoch_shuffle(df.repartition(13), "doc_id", epochs=3).collect()
    got2 = {(r["epoch"], r["doc_id"]): r["position"] for r in out2}
    got1 = {(r["epoch"], r["doc_id"]): r["position"] for r in out}
    assert got1 == got2


def test_epoch_shuffle_no_partitionless_window(spark):
    from fugue_warehouses_spark.extensions.sampling import epoch_shuffle

    df = spark.range(100).withColumnRenamed("id", "doc_id")
    out = epoch_shuffle(df, "doc_id", epochs=2)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "SinglePartition" not in plan
    assert "Window" not in plan


def test_epoch_shuffle_validates_epochs(spark):
    import pytest as _pytest

    from fugue_warehouses_spark.extensions.sampling import epoch_shuffle

    df = spark.range(5).withColumnRenamed("id", "doc_id")
    with _pytest.raises(ValueError, match="epochs"):
        epoch_shuffle(df, "doc_id", epochs=0)


def test_dsir_importance_prefers_target_like_docs(spark):
    from fugue_warehouses_spark.extensions.sampling import dsir_importance

    target = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(20)], "doc_id int, text string"
    )
    raw = spark.createDataFrame(
        [(1, "alpha beta alpha gamma"), (2, "omega zeta eta theta")],
        "doc_id int, text string",
    )
    w = {r["doc_id"]: r["dsir_logw"] for r in
         dsir_importance(raw, target, "text", "doc_id").collect()}
    # target-vocabulary doc scores strictly higher than off-target doc
    assert w[1] > w[2]
    assert w[1] > 0 > w[2]


def test_dsir_select_set_is_layout_independent(spark):
    from fugue_warehouses_spark.extensions.sampling import dsir_select

    target = spark.createDataFrame(
        [(i, f"tok{i % 7} tok{i % 3}") for i in range(50)],
        "doc_id int, text string",
    )
    raw = spark.createDataFrame(
        [(i, f"tok{i % 11} tok{i % 5} tok{i % 2}") for i in range(400)],
        "doc_id int, text string",
    )
    sel = dsir_select(raw, target, "text", "doc_id", n_select=25)
    rows = sel.collect()
    assert len(rows) == 25
    assert set(sel.columns) == {"doc_id", "dsir_logw", "sel_key"}
    again = dsir_select(
        raw.repartition(13), target.repartition(7), "text", "doc_id",
        n_select=25,
    ).collect()
    assert {r["doc_id"] for r in rows} == {r["doc_id"] for r in again}
    # a different salt perturbs the Gumbel draw -> (almost surely) a
    # different resample of the same weights
    other = dsir_select(
        raw, target, "text", "doc_id", n_select=25, salt="other"
    ).collect()
    assert {r["doc_id"] for r in rows} != {r["doc_id"] for r in other}


def test_dsir_empty_and_invalid_inputs(spark):
    from fugue_warehouses_spark.extensions.sampling import (
        dsir_importance,
        dsir_select,
    )

    target = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    raw = spark.createDataFrame(
        [(1, "a b"), (2, "   "), (3, "")], "doc_id int, text string"
    )
    w = dsir_importance(raw, target, "text", "doc_id").collect()
    # whitespace-only / empty docs carry no feature mass -> excluded
    assert {r["doc_id"] for r in w} == {1}
    with pytest.raises(ValueError, match="n_buckets"):
        dsir_importance(raw, target, "text", "doc_id", n_buckets=1)
    with pytest.raises(ValueError, match="n_select"):
        dsir_select(raw, target, "text", "doc_id", n_select=0)


def test_dsir_bigram_features(spark):
    from fugue_warehouses_spark.extensions.sampling import (
        _hashed_tokens,
        dsir_importance,
    )

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "x"), (3, "  "), (4, None)],
        "doc_id int, text string",
    )
    # unigram path unchanged: 3 + 1 + 0 + 0 token rows
    assert _hashed_tokens(df, "text", 64, F.col("doc_id")).count() == 4
    # ngram_max=2 adds bigrams 'a b','b c' for doc 1, none for the
    # 1-token / empty / NULL docs (the short-doc sequence guard)
    rows = _hashed_tokens(
        df, "text", 1 << 30, F.col("doc_id"), ngram_max=2
    ).collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], 0)
        per_doc[r["doc_id"]] += 1
    assert per_doc == {1: 5, 2: 1}
    # bigram features separate docs that share a unigram bag: with
    # unigrams only, both raw docs look identical to the target
    target = spark.createDataFrame(
        [(i, "red fish blue fish") for i in range(10)],
        "doc_id int, text string",
    )
    raw = spark.createDataFrame(
        [(1, "red fish blue fish"), (2, "fish red fish blue")],
        "doc_id int, text string",
    )
    uni = {r["doc_id"]: r["dsir_logw"] for r in
           dsir_importance(raw, target, "text", "doc_id").collect()}
    assert abs(uni[1] - uni[2]) < 1e-12
    bi = {r["doc_id"]: r["dsir_logw"] for r in
          dsir_importance(raw, target, "text", "doc_id", ngram_max=2).collect()}
    assert bi[1] > bi[2]
    import pytest as _pt

    with _pt.raises(ValueError, match="ngram_max"):
        _hashed_tokens(df, "text", 64, ngram_max=0)
