"""Distributed BPE (byte-pair-encoding) tokenizer training.

The canonical corpus-prep step this engine was still missing: learn a
merge table from the corpus itself (Sennrich et al. 2016 — the
algorithm behind GPT-2/RoBERTa-style tokenizers), expressed
Spark-first. The reference repo has no tokenizer training (north-star
extension, SURVEY.md §2.E); `doc_bpe_token_budget` estimates token
counts with a FIXED regex heuristic — this module learns the actual
merges.

Algorithm (classic word-frequency BPE):

1. wordcount the corpus once — all further work is VOCAB-sized, not
   corpus-sized (the standard trick that makes BPE trainable at all);
2. represent each distinct word as a space-separated symbol string
   ``"h e l l o </w>"``;
3. per merge step: count adjacent symbol pairs weighted by word
   frequency (one wordcount-shaped shuffle over pair strings), pick
   the argmax (ties break lexicographically so training is
   deterministic), and apply the merge to every word.

The merge application is pure string algebra, JVM-side: pad every
symbol with its OWN spaces (``' ' || replace(s,' ','  ') || ' '``),
so one left-to-right literal ``replace`` of ``' a  b '`` with
``' ab '`` implements exactly BPE's greedy non-overlapping merge —
including the self-overlap case (``a a a a -> aa aa``, the middle
pair skipped) — then collapse the doubled spaces. The same two
replaces run verbatim in the DuckDB oracle, which is how the facet is
hash-exact end-to-end (and both are pinned against a plain-Python
textbook BPE in tests).

Scale: the corpus is touched ONCE (wordcount). Each of the k merge
steps is one pair-count shuffle + one scalar argmax collect + one
narrow projection over the vocab table (checkpointed per iteration,
the same iterative-state pattern as k-means/PageRank here). At 100 TB
the vocab table is millions of rows — trivially distributed — and k
(30k merges for a production tokenizer) is the cost driver, which is
why real pipelines train on a sampled wordcount; `sample_words` caps
the vocab side deterministically for that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fugue_warehouses_spark.functions.text import tokens

END = "</w>"


def _word_seqs(df: DataFrame, text_col: str) -> DataFrame:
    """corpus -> (freq, s) with s the space-separated symbol string."""
    words = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    return words.select(
        "freq",
        F.concat(
            F.array_join(F.split("w", ""), " "), F.lit(" " + END)
        ).alias("s"),
    )


def _pair_counts(seq: DataFrame) -> DataFrame:
    """(freq, s) -> (p, c): adjacent-pair counts weighted by freq.
    slice+zip (never per-index element access — the O(n²) inlining
    hazard swept in round 10)."""
    l = F.split("s", " ")
    n = F.size(l)
    z = F.arrays_zip(
        F.slice(l, 1, n - 1).alias("a"), F.slice(l, 2, n - 1).alias("b")
    )
    return (
        seq.select("freq", F.explode(z).alias("z"))
        .select(
            F.concat_ws(" ", F.col("z.a"), F.col("z.b")).alias("p"), "freq"
        )
        .groupBy("p")
        .agg(F.sum("freq").alias("c"))
    )


def _merge_expr(col, pair: str):
    """The double-space merge algebra as a Column expression — the ONE
    Spark-side definition of a BPE merge step, shared by the trainer
    (`_apply_merge`) and the encoder (`bpe_encode`) so the two can
    never drift."""
    merged = pair.replace(" ", "")
    padded = F.concat(
        F.lit(" "), F.replace(col, F.lit(" "), F.lit("  ")), F.lit(" ")
    )
    target = " " + pair.replace(" ", "  ") + " "
    replaced = F.replace(padded, F.lit(target), F.lit(" " + merged + " "))
    return F.trim(F.replace(replaced, F.lit("  "), F.lit(" ")))


def _apply_merge(seq: DataFrame, pair: str) -> DataFrame:
    """Merge one pair in every word via the double-space replace."""
    return seq.select("freq", _merge_expr(F.col("s"), pair).alias("s"))


def _train_local(
    words: list[tuple[int, str]], n_merges: int
) -> list[tuple[str, int]]:
    """Driver-local BPE merge loop over a collected vocab — the exact
    same algebra as the distributed chain (pair counts weighted by
    word freq; argmax by count desc then PAIR STRING asc, compared as
    the joined ``"a b"`` string — a symbol-tuple compare would order
    prefix-sharing symbols differently around the space byte; greedy
    left-to-right non-overlapping merge). Equality with the
    distributed chain is pinned by tests/test_bpe.py."""
    vocab = [(int(f), s.split(" ")) for f, s in words]
    merges: list[tuple[str, int]] = []
    for _ in range(n_merges):
        cnt: dict[tuple[str, str], int] = {}
        for f, syms in vocab:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                cnt[p] = cnt.get(p, 0) + f
        if not cnt:  # vocab fully merged — nothing left to learn
            break
        (a, b), c = min(
            cnt.items(), key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1])
        )
        merges.append((a + " " + b, int(c)))
        ab = a + b
        nxt: list[tuple[int, list[str]]] = []
        for f, syms in vocab:
            out: list[str] = []
            i, n = 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nxt.append((f, out))
        vocab = nxt
    return merges


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    sample_words: int | None = None,
    local_merge_ops_below: float = 5e6,
    local_bytes_below: int = 256 << 20,
) -> tuple[DataFrame, list[tuple[str, int]]]:
    """Learn ``n_merges`` BPE merges from the corpus.

    Returns ``(merge_table_df, merges)``: the DataFrame has one row
    per step ``(step int, pair string, pair_freq long)``; ``merges``
    is the same as a driver-side list for feeding :func:`bpe_encode`.
    ``sample_words`` deterministically caps the vocab side (top-n
    words by frequency, ties by word) — the production lever when the
    distinct-word table is itself huge.

    Each iteration collects ONE scalar row (the argmax pair) — the
    bounded-collect contract every iterative op here follows; the
    vocab table is localCheckpoint'ed per step so the replace chain
    never builds an unbounded lineage. Checkpoints are LAZY
    (round 11, guide §1.2 "fewer passes"): each step's argmax collect
    is the next job anyway, so it materializes the pending checkpoint
    for free — eager checkpoints ran a separate job per step (one
    full extra pass over the vocab table each), measured 28 jobs for
    the 8-merge facet vs ~11 lazy, and the trailing merge's
    checkpoint (which no consumer ever reads) is never materialized
    at all. The collects are strictly sequential, so the
    lazy-checkpoint-under-concurrent-jobs scheduler caveat
    (retrieval_eval) does not apply.

    SMALL vocabs train on the DRIVER instead (round 12, the
    ``plans/bounded`` gated-fast-path convention): after the one
    corpus wordcount, a single aggregate measures the vocab's exact
    row count and byte size (it doubles as the checkpoint's
    materialization), and when both the estimated Python merge work
    (``n_merges`` sequential vocab scans ≈ n_merges x bytes/2 symbol
    visits; the 5e6 default is ~0.5 s of driver work at the ~10M
    visits/s a Python dict-count loop sustains — sized against
    SCALE_NOTES' round-11 probe, where the DISTRIBUTED iteration is
    flat ~0.55 s/step up to a 1.28M-word vocab, so a laxer budget
    would hand mid-size vocabs to a slower driver loop) and the
    estimated driver transfer sit under their budgets
    the k merge steps run as one collect + a pure-Python loop —
    2 jobs instead of 2 + 2k (each distributed step is a vocab-sized
    pair-count shuffle + argmax collect, pure scheduler floor when
    the vocab is tiny: 19 jobs / 19 tasks / 0.6 s summed task time
    profiled for the 8-merge facet at sf0.1). Above either budget
    (a real web-corpus vocab, or a production 30k-merge run) the
    distributed chain below runs exactly as before — it IS the
    at-scale path. The local loop's merge table is IDENTICAL by
    construction (same counts, same joined-pair-string tie-break,
    same greedy non-overlapping merge); tests/test_bpe.py pins
    local == distributed == textbook on tie-heavy corpora.
    """
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    spark = df.sparkSession
    seq = _word_seqs(df, text_col)
    if sample_words is not None:
        seq = seq.orderBy(F.desc("freq"), F.asc("s")).limit(sample_words)
    seq = seq.localCheckpoint(eager=False)
    from fugue_warehouses_spark.plans.bounded import driver_fast_path_ok

    # one aggregate: exact vocab rows + bytes, estimated BEFORE any
    # transfer; also materializes the lazy checkpoint either path reads
    vstats = seq.agg(
        F.count("*").alias("n"),
        F.coalesce(F.sum(F.octet_length("s")), F.lit(0)).alias("b"),
    ).first()
    n_vocab, vbytes = int(vstats["n"]), int(vstats["b"])
    merges: list[tuple[str, int]] = []
    if driver_fast_path_ok(
        "bpe_train_local",
        # ~2 bytes per symbol ("x " incl. separator): merge work is
        # n_merges full scans of the symbol stream
        merge_ops=(n_merges * vbytes / 2.0, local_merge_ops_below),
        # Python str/tuple overhead x3 (split lists + count dict keys)
        driver_bytes=(vbytes * 3.0 + n_vocab * 120.0, local_bytes_below),
    ):
        merges = _train_local(
            [(r["freq"], r["s"]) for r in seq.collect()], n_merges
        )
    else:
        for _step in range(n_merges):
            best = (
                _pair_counts(seq)
                .orderBy(F.desc("c"), F.asc("p"))
                .limit(1)
                .collect()
            )
            if not best:  # vocab fully merged — nothing left to learn
                break
            pair, c = best[0]["p"], int(best[0]["c"])
            merges.append((pair, c))
            seq = _apply_merge(seq, pair).localCheckpoint(eager=False)
    # one-slice local frame: k merge rows need one slice, not
    # defaultParallelism (plans/localframe.py)
    from fugue_warehouses_spark.plans.localframe import local_frame

    out = local_frame(
        spark,
        [(i, p, c) for i, (p, c) in enumerate(merges)],
        "step int, pair string, pair_freq long",
    )
    return out, merges


def bpe_encode(
    df: DataFrame, text_col: str, merges: list[tuple[str, int] | str]
) -> DataFrame:
    """Apply a learned merge table: adds ``bpe_tokens array<string>``
    and ``n_bpe_tokens int`` per row — the REAL token count the
    token-budget facets estimate. One narrow projection per merge
    (all codegen'd into a single stage), no shuffle."""
    # per-word framing: spaces in the original text become word
    # boundaries; the </w> marker keeps merges from crossing words
    sym = F.array_join(
        F.transform(
            tokens(text_col),
            lambda w: F.concat(
                F.array_join(F.split(w, ""), " "), F.lit(" " + END)
            ),
        ),
        " ",
    )
    col = sym
    for m in merges:
        col = _merge_expr(col, m[0] if isinstance(m, tuple) else m)
    # empty/whitespace-only docs symbolize to '' — their token list is
    # empty, not [''] (F.split('', ' ') phantom-counts one token);
    # branch on the cheap source-token count, not on the full merge
    # chain (a `col == ''` branch would inline the chain twice)
    toks_col = F.when(
        F.size(tokens(text_col)) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(col, " "))
    return df.withColumn("bpe_tokens", toks_col).withColumn(
        "n_bpe_tokens", F.size(toks_col)
    )


def bpe_train_sql(n_merges: int = 8) -> str:
    """DuckDB twin of ``bpe_train`` over ``documents`` (MATERIALIZED
    chained CTEs — one per merge step; without MATERIALIZED the chain
    re-evaluates exponentially). Vocab exhaustion (no pairs left
    before step k) matches the trainer's ``break``: an empty
    ``best{{i}}`` emits no merge row and passes ``seq`` through
    unchanged — the scalar subquery's NULL must never reach
    ``replace`` (it would NULL-poison the whole chain)."""
    toks = r"list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> '')"
    sql = f"""
    WITH words AS MATERIALIZED (
      SELECT tok AS w, count(*)::BIGINT AS freq
      FROM documents, UNNEST({toks}) AS u(tok) GROUP BY tok),
    seq0 AS MATERIALIZED (
      SELECT freq,
             array_to_string(string_split(w, ''), ' ') || ' {END}' AS s
      FROM words)"""
    selects = []
    for i in range(n_merges):
        sql += f""",
    pairs{i} AS MATERIALIZED (
      SELECT l[g.i] || ' ' || l[g.i+1] AS p, sum(freq) AS c
      FROM (SELECT freq, string_split(s, ' ') AS l FROM seq{i}) t,
           LATERAL (SELECT unnest(range(1, len(t.l))) AS i) g
      GROUP BY p),
    best{i} AS MATERIALIZED (
      SELECT p, c FROM pairs{i} ORDER BY c DESC, p ASC LIMIT 1),
    seq{i + 1} AS MATERIALIZED (
      SELECT freq,
             CASE WHEN (SELECT p FROM best{i}) IS NULL THEN s
                  ELSE trim(replace(replace(
                    ' ' || replace(s, ' ', '  ') || ' ',
                    ' ' || replace((SELECT p FROM best{i}), ' ', '  ')
                        || ' ',
                    ' ' || replace((SELECT p FROM best{i}), ' ', '')
                        || ' '),
                    '  ', ' ')) END AS s
      FROM seq{i})"""
        selects.append(
            f"SELECT {i} AS step, p AS pair, c::BIGINT AS pair_freq "
            f"FROM best{i}"
        )
    sql += "\n    " + "\n    UNION ALL ".join(selects) + "\n    ORDER BY step"
    return sql


def bpe_encode_sql(n_merges: int = 8) -> str:
    """DuckDB twin of train-then-encode over ``documents``: the
    ``bpe_train_sql`` CTE chain learns the merges, then the corpus is
    symbolized and pushed through the same ``n_merges`` padded
    replaces; output is per-source real-BPE token mass."""
    toks = r"list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> '')"
    train = bpe_train_sql(n_merges)
    # reuse the training chain's CTEs; drop its final SELECT
    head = train[: train.rindex("\n    SELECT 0 AS step")]
    sql = head + f""",
    enc0 AS MATERIALIZED (
      SELECT source,
             len({toks})::BIGINT AS ws_tokens,
             array_to_string(list_transform({toks},
               w -> array_to_string(string_split(w, ''), ' ')
                    || ' {END}'), ' ') AS s
      FROM documents)"""
    for i in range(n_merges):
        sql += f""",
    enc{i + 1} AS MATERIALIZED (
      SELECT source, ws_tokens,
             CASE WHEN (SELECT p FROM best{i}) IS NULL THEN s
                  ELSE trim(replace(replace(
                    ' ' || replace(s, ' ', '  ') || ' ',
                    ' ' || replace((SELECT p FROM best{i}), ' ', '  ')
                        || ' ',
                    ' ' || replace((SELECT p FROM best{i}), ' ', '')
                        || ' '),
                    '  ', ' ')) END AS s
      FROM enc{i})"""
    # empty/whitespace-only docs symbolize to '' — count them as 0
    # BPE tokens (string_split('') would phantom-count 1)
    sql += f"""
    SELECT source, count(*)::BIGINT AS n_docs,
           sum(ws_tokens)::BIGINT AS total_ws_tokens,
           sum(CASE WHEN s = '' THEN 0
                    ELSE len(string_split(s, ' ')) END)::BIGINT
             AS total_bpe_tokens,
           round(sum(CASE WHEN s = '' THEN 0
                          ELSE len(string_split(s, ' ')) END)
                 / sum(ws_tokens), 6) AS bpe_per_word
    FROM enc{n_merges} GROUP BY source ORDER BY source"""
    return sql
