"""Text-analysis column functions — pure Spark expressions, JVM-side.

North-star text ops (SURVEY.md §2.E): token counting, quality scoring,
language ID, document fingerprinting. Everything here is built from
``pyspark.sql.functions`` so it stays inside whole-stage codegen — no
Python UDFs — and every function has an exact ANSI-SQL twin used by the
DuckDB oracle (see fugue_warehouses_spark/queries.py), which is what
makes these ops hash-verifiable.

Heuristics are deliberately simple + deterministic (n-gram/stopword
arithmetic), the classic cheap pre-filters of LLM-corpus pipelines;
model-based scoring would slot in as a Pandas UDF stage after these.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# whole-token stopword sets per language for the lang-id heuristic;
# compact on purpose so the oracle SQL stays writable by hand.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "und", "die", "das", "ist"),
    "fr": ("le", "et", "la", "les", "est"),
    "es": ("el", "y", "los", "que", "es"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2"),
}

STOPWORDS_EN: tuple[str, ...] = ("the", "a", "an", "and", "of", "to", "in", "is")

_PUNCT_CLASS = r"[^.,!?;:]"


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization -> array<string> (empty-safe)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != F.lit(""))


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("long")


def char_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c).cast("long")


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are sentence punctuation."""
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(F.regexp_replace(c, _PUNCT_CLASS, ""))
    return (n_punct / F.greatest(F.length(c), F.lit(1))).cast("double")


def stopword_ratio(col: Column | str, stopwords: tuple[str, ...] = STOPWORDS_EN) -> Column:
    toks = tokens(col)
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return (hits / F.greatest(F.size(toks), F.lit(1))).cast("double")


def mean_token_length(col: Column | str) -> Column:
    toks = tokens(col)
    total = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    return (total / F.greatest(F.size(toks), F.lit(1))).cast("double")


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality heuristic: enough tokens, sane token
    length, some stopwords, not punctuation-soup. Mirrors the classic
    C4/Gopher-style cheap filters; exact twin in oracle SQL."""
    ntok = token_count(col)
    len_ok = F.when(ntok >= 20, F.lit(1.0)).otherwise(ntok / F.lit(20.0))
    mtl = mean_token_length(col)
    mtl_ok = F.when((mtl >= 3.0) & (mtl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
    stop_ok = F.when(stopword_ratio(col) >= 0.05, F.lit(1.0)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio(col) <= 0.2, F.lit(1.0)).otherwise(F.lit(0.0))
    return ((len_ok + mtl_ok + stop_ok + punct_ok) / F.lit(4.0)).cast("double")


def marker_hits(col: Column | str, markers: tuple[str, ...]) -> Column:
    return F.size(F.filter(tokens(col), lambda t: F.lower(t).isin(*markers))).cast(
        "long"
    )


def lang_id(col: Column | str) -> Column:
    """Argmax over per-language marker-token counts; 'und' if no hits.

    Ties break by the fixed language order below (deterministic)."""
    counts = {lang: marker_hits(col, m) for lang, m in LANG_MARKERS.items()}
    best = F.greatest(*counts.values())
    out = F.lit("und")
    # reversed so the first language in LANG_MARKERS wins ties
    for lang in reversed(list(LANG_MARKERS)):
        out = F.when((counts[lang] > 0) & (counts[lang] == best), F.lit(lang)).otherwise(
            out
        )
    return out


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of whitespace-normalized
    lowercase text. Exact-dup detection key; md5 exists in DuckDB too."""
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    return F.md5(normalized)


def bpe_token_estimate(col: Column | str, chars_per_token: int = 4) -> Column:
    """BPE-ish token-count estimate: whitespace words, each contributing
    ceil(len/chars_per_token) subword tokens — the standard cheap
    approximation of BPE tokenizer counts (~4 chars/token for English)
    used for corpus budgeting. Expression-only; exact SQL twin exists."""
    toks = tokens(col)
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc
        + F.ceil(F.length(t) / F.lit(float(chars_per_token))).cast("long"),
    )


def char_ngrams(col: Column | str, n: int = 3) -> Column:
    """Distinct character n-grams (shingles) -> array<string>.

    Expression-only (stays JVM-side for the MinHash/Jaccard
    pipelines), built by slice+zip_with offset pairing over the
    per-char split — NOT by per-position ``substr`` over an index
    sequence. The substr form is O(len²) per document: UTF8String is
    byte-addressed, so ``substr(i, n)`` must walk from the string
    start to find char offset i, and the round-10 inlining sweep
    mis-audited it as O(1) ("substr over a plain column attribute").
    The round-11 long-document canary measured the old form at 76 s
    for 8 x 115 KB docs vs ~1 s for this one
    (tests/test_properties.py: the text-kernel canary). Offset slices
    are zip_with ARGUMENTS, evaluated once per row — never per
    element. Semantics preserved exactly (oracle twins replay them):
    len >= n gives the len-n+1 grams; len < n gives one gram, the
    whole (short) string — the coalesce absorbs zip_with's null
    padding on the out-of-range offsets in that case only."""
    c = F.col(col) if isinstance(col, str) else col
    n_grams = F.greatest(F.length(c) - (n - 1), F.lit(1))
    chars = F.split(c, "")
    g = F.slice(chars, 1, n_grams)
    for off in range(1, n):
        g = F.zip_with(
            g,
            F.slice(chars, 1 + off, n_grams),
            lambda a, b: F.concat(a, F.coalesce(b, F.lit(""))),
        )
    return F.array_distinct(g)


def chunk_text(
    col: Column | str,
    chunk_tokens: int = 64,
    overlap: int = 16,
    tokens_col: Column | None = None,
) -> Column:
    """Sliding-window token chunks -> array<string> of chunk texts.

    The standard training-data chunking op: whitespace tokens, windows
    of ``chunk_tokens`` advancing by ``chunk_tokens - overlap``; the
    final window may be shorter, and a document always yields >= 1
    chunk. Pure expressions (sequence + slice + concat_ws), so the
    explode that usually follows stays JVM-side and the whole thing is
    SQL-oracle-expressible.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    # Expression-inlining hazard (round-10 lesson, see
    # contamination.word_ngrams): the slice inside the per-chunk
    # lambda re-evaluates ``toks`` — i.e. re-tokenizes the document —
    # once per CHUNK, O(tokens²/step) per row. Unlike the n-gram case
    # the strided windows can't be rebuilt by zip_with offset pairing,
    # so for long-document corpora pass ``tokens_col``: a reference to
    # an already-MATERIALIZED array<string> column (e.g. projected and
    # localCheckpoint'ed, the dedup-module barrier pattern) — a column
    # attribute costs O(1) per reference. At the fixtures' ~250-token
    # docs the quadratic term is noise; at 100k-token documents it is
    # the whole cost.
    toks = tokens_col if tokens_col is not None else tokens(col)
    n = F.size(toks)
    n_chunks = F.greatest(
        F.lit(1),
        ((n - F.lit(overlap) + F.lit(step - 1)) / F.lit(step)).cast("long"),
    )
    return F.transform(
        F.sequence(F.lit(0), (n_chunks - 1).cast("int")),
        lambda i: F.concat_ws(
            " ", F.slice(toks, i * step + 1, chunk_tokens)
        ),
    )
