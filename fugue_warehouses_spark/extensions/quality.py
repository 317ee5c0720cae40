"""Corpus-quality operators: repetition filtering and PII redaction.

Gopher-style repetition rules (Rae et al. 2021, §A1.1: fraction of
duplicate tokens / dominance of the single most frequent token) and
regex PII scrubbing are the standard cheap gates of an LLM-data
pipeline. Both are pure built-in-function plans:

- repetition: explode tokens -> (doc, token) hash aggregate with
  map-side combine -> per-doc re-aggregate. Two shuffles, both on
  aggregated rows; no Python. At 100 TB this is the canonical
  wordcount shape — partial aggregation keeps the (doc, token) shuffle
  proportional to *distinct* pairs per partition, not raw tokens.
- PII: regexp_count/regexp_replace inside codegen, per-row only — no
  shuffle at all until the caller aggregates.

The reference has no corpus-quality layer (it delegates SQL to
warehouses); this extends SURVEY.md §2.E. Patterns are restricted to
the RE2 ∩ java.util.regex common dialect (character classes +
quantifiers, no backrefs/lookarounds) so the DuckDB oracle runs the
same regex byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fugue_warehouses_spark.functions.text import tokens

# RE2-and-Java-safe PII patterns (no lookaround/backrefs; identical
# bytes run in DuckDB oracles). EMAIL_RE is case-insensitive via
# explicit A-Z classes (inline (?i) placement differs across engines).
# PHONE_RE covers NANP "+1-NNN-NNNN" (the fixture's synthetic shape)
# and the full "+1-NNN-NNN-NNNN"; it is deliberately NOT a general
# phone detector — formats like "(555) 123-4567" or bare 10-digit
# runs need a locale-aware library, not a regex gate.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+1-[0-9]{3}-(?:[0-9]{3}-)?[0-9]{4}"


def repetition_metrics(
    df: DataFrame, id_col: str, text_col: str, keep_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Per-document token-repetition metrics.

    Output: (id, *keep_cols, n_tokens, n_distinct, top_token_count,
    dup_frac, top_frac) where dup_frac = 1 - distinct/total and
    top_frac = most-frequent-token count / total. Empty docs drop out
    (no tokens to judge).
    """
    toks = df.select(
        F.col(id_col), *[F.col(c) for c in keep_cols],
        F.explode(tokens(text_col)).alias("__tok"),
    )
    cnt = toks.groupBy(id_col, *keep_cols, "__tok").agg(
        F.count("*").alias("__c")
    )
    per = cnt.groupBy(id_col, *keep_cols).agg(
        F.sum("__c").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        F.max("__c").alias("top_token_count"),
    )
    return per.select(
        id_col,
        *keep_cols,
        "n_tokens",
        "n_distinct",
        "top_token_count",
        (F.lit(1.0) - F.col("n_distinct") / F.col("n_tokens")).alias("dup_frac"),
        (F.col("top_token_count") / F.col("n_tokens")).alias("top_frac"),
    )


def repetition_flags(
    metrics: DataFrame, max_dup_frac: float = 0.8, max_top_frac: float = 0.3
) -> DataFrame:
    """Gopher-rule pass/fail flag on top of ``repetition_metrics``."""
    return metrics.withColumn(
        "flagged",
        (F.col("dup_frac") > max_dup_frac) | (F.col("top_frac") > max_top_frac),
    )


def unigram_surprisal(
    df: DataFrame, id_col: str, text_col: str, keep_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Per-document mean unigram surprisal -ln p(token) under the
    corpus's own unigram distribution — the cheap perplexity proxy
    used to rank corpus quality before any model-based scorer.

    Plan: one wordcount pass builds the vocabulary distribution; the
    token stream joins it BY BROADCAST (a vocabulary is small relative
    to any corpus) so the per-occurrence surprisal lookup adds no
    shuffle; then one per-doc aggregate. ln(total)-ln(cnt) instead of
    -ln(cnt/total) keeps one transcendental call per distinct count.

    Output: (id, *keep_cols, n_tokens, mean_surprisal).
    """
    toks = df.select(
        F.col(id_col), *[F.col(c) for c in keep_cols],
        F.explode(tokens(text_col)).alias("__tok"),
    )
    vocab = toks.groupBy("__tok").agg(F.count("*").alias("__cnt"))
    total = vocab.agg(F.sum("__cnt").alias("__total"))
    scored = toks.join(F.broadcast(vocab), "__tok").join(F.broadcast(total))
    return scored.groupBy(id_col, *keep_cols).agg(
        F.count("*").alias("n_tokens"),
        F.avg(F.log("__total") - F.log("__cnt")).alias("mean_surprisal"),
    )


def redact_pii(
    df: DataFrame, text_col: str, out_col: str = "redacted"
) -> DataFrame:
    """Scrub emails/phones; count what was removed.

    Adds (out_col, n_emails, n_phones) — the redacted text plus exact
    match counts, all JVM-side regex (no Python)."""
    c = F.col(text_col)
    return df.withColumns(
        {
            "n_emails": F.regexp_count(c, F.lit(EMAIL_RE)).cast("long"),
            "n_phones": F.regexp_count(c, F.lit(PHONE_RE)).cast("long"),
            out_col: F.regexp_replace(
                F.regexp_replace(c, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
            ),
        }
    )


# ---------------------------------------------------------------------
# linear quality model: vectorized Arrow-batch inference
# ---------------------------------------------------------------------

# published toy weights of a fastText/sklearn-style linear quality
# classifier over four cheap features; the values are fixed so the
# DuckDB oracle can reproduce the score bit-for-bit
QUALITY_LOGIT = {
    "bias": -2.0,
    "len": 2.5,      # f1 = min(n_tokens, 100) / 100
    "mtl": 0.35,     # f2 = mean token length
    "mtl_sq": -0.08, # f2² (too-long tokens = code/garbage)
    "stop": 6.0,     # f3 = stopword ratio
    "punct": -9.0,   # f4 = punctuation ratio
}


def quality_logit_scores(
    df: DataFrame, text_col: str = "text", keep_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Model-scoring stage: a linear quality classifier evaluated in
    vectorized Arrow batches — the exact execution shape of any
    fastText / sklearn-linear / distilled-classifier scorer in a
    100 TB curation pipeline (features computed JVM-side in codegen;
    the model itself runs as one numpy expression per Arrow batch in a
    pandas UDF; swap the arithmetic for `model.predict` and nothing
    about the plan changes). Per row: ``z`` (the logit — sign gives
    the decision bit-deterministically) and ``prob`` (sigmoid).

    No shuffle: scan -> feature projection -> batched UDF, all
    pipelined.
    """
    from fugue_warehouses_spark.functions import text as TX

    w = QUALITY_LOGIT

    @F.pandas_udf("z double, prob double")
    def score(f1, f2, f3, f4):  # type: ignore[no-untyped-def]
        import numpy as np
        import pandas as pd

        a1, a2, a3, a4 = (s.to_numpy(dtype="float64") for s in (f1, f2, f3, f4))
        # association order matters for bit-identical oracle replay:
        # ((((bias + w1·f1) + w2·f2) - |w|·f2²) + w3·f3) + w4·f4
        z = (
            (
                ((w["bias"] + w["len"] * a1) + w["mtl"] * a2)
                + w["mtl_sq"] * (a2 * a2)
            )
            + w["stop"] * a3
        ) + w["punct"] * a4
        prob = 1.0 / (1.0 + np.exp(-z))
        return pd.DataFrame({"z": z, "prob": prob})

    feats = df.select(
        *keep_cols,
        (F.least(TX.token_count(text_col), F.lit(100)).cast("double") / F.lit(100.0)).alias("__f1"),
        TX.mean_token_length(text_col).alias("__f2"),
        TX.stopword_ratio(text_col).alias("__f3"),
        TX.punct_ratio(text_col).alias("__f4"),
    )
    scored = feats.withColumn("__s", score("__f1", "__f2", "__f3", "__f4"))
    return scored.select(
        *keep_cols,
        F.col("__s.z").alias("z"),
        F.col("__s.prob").alias("prob"),
    )


def bigram_logprob(
    df: DataFrame,
    id_col: str,
    text_col: str,
    keep_cols: tuple[str, ...] = (),
    k: float = 0.5,
) -> DataFrame:
    """Per-document mean log p(w_i | w_{i-1}) under the corpus's own
    add-k-smoothed bigram model — the KenLM/CCNet-style perplexity
    filter one step up from :func:`unigram_surprisal`: repetitive or
    template text scores high (predictable), shuffled/garbled text
    scores low, even when its unigram mix looks normal.

    p(w2 | w1) = (c(w1 w2) + k) / (c(w1 ·) + k·V) with V = |vocab|;
    documents with fewer than two tokens are dropped (no bigrams).

    Plan shape: bigrams come from zipping the token array with its
    own tail (no positional self-join); one shuffle builds the bigram
    count table and one key-shuffle joins it back (AQE broadcasts it
    when small); the left-context counts and the vocab size are
    unigram-scale and broadcast outright; then one per-doc aggregate.
    At 100 TB the bigram table is the only corpus-proportional side —
    it shuffles on the 2-token key, never on documents.

    Output: (id, *keep_cols, n_bigrams, mean_logprob).
    """
    tl = df.select(
        F.col(id_col), *[F.col(c) for c in keep_cols],
        tokens(text_col).alias("__ts"),
    )
    n = F.size(F.col("__ts"))
    bg = tl.filter(n >= 2).select(
        F.col(id_col), *[F.col(c) for c in keep_cols],
        F.explode(
            F.arrays_zip(
                F.slice(F.col("__ts"), 1, n - 1),
                F.slice(F.col("__ts"), 2, n - 1),
            )
        ).alias("__bg"),
    ).select(
        F.col(id_col), *[F.col(c) for c in keep_cols],
        F.col("__bg.0").alias("__w1"), F.col("__bg.1").alias("__w2"),
    ).localCheckpoint(eager=False)
    # ^ lazy barrier: bg feeds three branches (c2, c1, scored) — without
    # it the explode subtree re-runs per branch. tl (scan + split) is
    # deliberately NOT checkpointed: its two consumers re-run a pruned
    # one-column scan + codegen split, which measures cheaper than
    # materializing corpus-sized token arrays (0.94s vs 1.57s at sf0.1).
    c2 = bg.groupBy("__w1", "__w2").agg(F.count("*").alias("__c12"))
    c1 = bg.groupBy("__w1").agg(F.count("*").alias("__c1"))
    vocab = tl.select(F.explode("__ts").alias("__tok")).agg(
        F.countDistinct("__tok").alias("__v")
    )
    scored = (
        bg.join(c2, ["__w1", "__w2"])
        .join(F.broadcast(c1), "__w1")
        .join(F.broadcast(vocab))
    )
    lp = F.log(F.col("__c12") + F.lit(k)) - F.log(
        F.col("__c1") + F.lit(k) * F.col("__v")
    )
    return scored.groupBy(id_col, *[F.col(c) for c in keep_cols]).agg(
        F.count("*").alias("n_bigrams"),
        F.avg(lp).alias("mean_logprob"),
    )
