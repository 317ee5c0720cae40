"""Benchmark decontamination: n-gram overlap against a probe set.

The standard pretraining hygiene step (GPT-3 appendix C / The Pile):
a training document is *contaminated* if it shares at least one word
n-gram with an evaluation/benchmark document. Semantically this is a
set-intersection join between the corpus's n-gram multiset and the
(much smaller) probe n-gram set.

Scale design: the probe side is a benchmark — thousands of documents,
millions of n-grams at most — so its DISTINCT gram set broadcasts;
the 100 TB corpus side is a narrow explode (no shuffle) into a
broadcast LEFT SEMI probe, followed by one doc-id distinct. With
``hash_grams=True`` the broadcast carries 8-byte xxhash64 values
instead of gram strings (~10× smaller; collision odds ~1e-19 per pair
at 64 bits).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fugue_warehouses_spark.functions.text import tokens


def word_ngrams(col: Column | str, n: int = 5) -> Column:
    """Space-joined word n-grams of the lowercased text, as
    array<string>; empty for documents shorter than n tokens.

    Built by chained slice+zip_with offset pairing (the k-gram array
    from the (k-1)-gram array and the token array), NOT by slicing
    inside a per-index ``F.transform`` lambda: higher-order-function
    lambdas re-evaluate every non-trivial child expression per
    ELEMENT, so ``slice(tokens(...), i+1, n)`` re-tokenized the whole
    document once per gram — O(tokens²) per row (the round-10 DSIR
    bigram lesson; measured here: 114x at 10k-token documents,
    127.3 s -> 1.12 s for 128 docs, and only the scheduling floor hid
    it at the fixtures' ~250 tokens). Whole-array
    operations evaluate each child once per REFERENCE: the token
    expression is evaluated n times per row, not tokens times."""
    ts = tokens(F.lower(F.col(col) if isinstance(col, str) else col))
    g = ts
    for k in range(2, n + 1):
        cnt = F.size(ts) - F.lit(k - 1)
        g = F.zip_with(
            F.slice(g, 1, cnt),
            F.slice(ts, k, cnt),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    # the when() guard evaluates lazily per row, so the slices above
    # never see a non-positive length
    return F.when(F.size(ts) >= n, g).otherwise(
        F.array().cast("array<string>")
    )


def probe_gram_set(
    probes: DataFrame, text_col: str = "text", n: int = 5, hash_grams: bool = True
) -> DataFrame:
    """Distinct n-gram set of the probe corpus — one column ``g``."""
    g = F.explode(word_ngrams(text_col, n)).alias("g")
    out = probes.select(g)
    if hash_grams:
        out = out.select(F.xxhash64("g").alias("g"))
    return out.distinct()


def contaminated_doc_ids(
    corpus: DataFrame,
    probes: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    hash_grams: bool = True,
) -> DataFrame:
    """Ids of corpus documents sharing >= 1 word n-gram with probes.

    Plan: explode corpus grams (narrow) -> broadcast LEFT SEMI against
    the probe gram set -> distinct ids (the only shuffle, on doc id).
    """
    g = F.explode(word_ngrams(text_col, n)).alias("g")
    corpus_grams = corpus.select(F.col(id_col), g)
    if hash_grams:
        corpus_grams = corpus_grams.select(id_col, F.xxhash64("g").alias("g"))
    probe = probe_gram_set(probes, text_col, n, hash_grams)
    return (
        corpus_grams.join(F.broadcast(probe), "g", "left_semi")
        .select(id_col)
        .distinct()
    )


def decontaminate_spans(
    corpus: DataFrame,
    probes: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    keep_cols: tuple[str, ...] = (),
    hash_grams: bool = True,
) -> DataFrame:
    """Span-surgery decontamination: instead of dropping every document
    that shares an n-gram with the probe set (``contaminated_doc_ids``,
    the GPT-3 appendix-C policy), remove only the covered token
    positions and keep the rest of the document — the higher-recall
    policy used when the corpus is scarce relative to the benchmark
    overlap (a license header or a quoted benchmark item should not
    cost the whole document).

    Returns one row per CONTAMINATED corpus document:
    ``(id_col, *keep_cols, n_tokens, removed_tokens, clean_text)``
    where ``clean_text`` is the document with every token covered by
    >= 1 shared n-gram removed, survivors re-joined with single
    spaces. Matching is on lowercased word n-grams (same semantics as
    ``contaminated_doc_ids``); reconstruction uses the RAW tokens, and
    the two align position-for-position because lowercasing never
    moves a whitespace boundary. Documents with no shared gram are not
    returned (they need no surgery — callers union them back
    untouched).

    Scale shape: the probe gram set broadcasts (8-byte hashes by
    default); the corpus side is one narrow gram posexplode into the
    broadcast LEFT SEMI probe. The only shuffles are the hit-start
    groupBy (contaminated-WINDOW-sized, not corpus-sized) and the
    doc-keyed inner join back (contaminated-DOC-sized). The covered
    position set is computed in the aggregate's own projection, so
    downstream lambdas see it as a plain column attribute (round-10
    inlining lesson, see ``word_ngrams``), and the reconstruction is
    LINEAR in document length — see the array_except comment below."""
    # fan out an unsplittable corpus scan (round 11, guide §2.5): a
    # single-row-group input runs BOTH corpus passes below (the gram
    # posexplode and the token projection) serially on one core; the
    # keyed repartition is a no-op at real scan parallelism and its
    # exchange is shared by the two consumers (see plans/scanout.py).
    # Interleaved A/B at sf0.1: 2.66 -> 1.93 s min, identical rows.
    from fugue_warehouses_spark.plans.scanout import fan_out_scan

    corpus = fan_out_scan(corpus, id_col)
    probe = probe_gram_set(probes, text_col, n, hash_grams)
    # posexplode index == 0-based token start of the gram
    corpus_grams = corpus.select(
        F.col(id_col), F.posexplode(word_ngrams(text_col, n)).alias("s", "g")
    )
    if hash_grams:
        corpus_grams = corpus_grams.select(
            id_col, "s", F.xxhash64("g").alias("g")
        )
    hits = (
        corpus_grams.join(F.broadcast(probe), "g", "left_semi")
        .groupBy(id_col)
        .agg(F.collect_list("s").alias("__starts"))
        .select(
            F.col(id_col),
            F.array_sort(
                F.array_distinct(
                    F.flatten(
                        F.transform(
                            "__starts",
                            lambda s: F.sequence(s, s + F.lit(n - 1)),
                        )
                    )
                )
            ).alias("__covered"),
        )
    )
    toks = corpus.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        tokens(text_col).alias("__toks"),
    )
    # Linear reconstruction: surviving POSITIONS via array_except
    # (hash-based, order-preserving), then O(1) array indexing per
    # survivor. The tempting filter-with-index form —
    # ``F.filter(toks, (t, i) -> !array_contains(covered, i))`` — is
    # O(len x covered) per document: a fully-contaminated 100k-token
    # document would pay 1e10 comparisons (the round-10/11 quadratic
    # class, invisible at fixture lengths; the long-doc canary in
    # tests/test_properties.py covers this kernel). ``__toks`` is a
    # projected attribute, so referencing it inside the transform
    # lambda costs O(1) per element. A contaminated doc has >= n
    # tokens (it produced a gram), so size - 1 >= 0 and the sequence
    # below never runs backwards.
    surv_pos = F.array_except(
        F.sequence(F.lit(0), F.size("__toks") - 1), F.col("__covered")
    )
    return toks.join(hits, id_col, "inner").select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        F.size("__toks").cast("long").alias("n_tokens"),
        F.size("__covered").cast("long").alias("removed_tokens"),
        F.array_join(
            F.transform(
                surv_pos,
                lambda p: F.element_at(F.col("__toks"), p + F.lit(1)),
            ),
            " ",
        ).alias("clean_text"),
    )


def contamination_report(
    corpus: DataFrame,
    probes: DataFrame,
    group_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """Per-group census: documents checked vs contaminated."""
    hits = contaminated_doc_ids(corpus, probes, text_col, id_col, n).withColumn(
        "_hit", F.lit(1)
    )
    return (
        corpus.join(F.broadcast(hits), id_col, "left")
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long").alias(
                "n_contaminated"
            ),
        )
    )
