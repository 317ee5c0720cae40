"""Content-defined chunking (CDC) for sub-document deduplication.

Fixed-size chunking breaks dedup the moment one byte shifts a
boundary; content-defined chunking (Rabin-style, as in LBFS/rsync and
the dataset-dedup literature) cuts where a windowed rolling hash of
the text itself hits a sentinel value, so identical passages chunk
identically regardless of their offset in the document. That turns
"near-duplicate documents share long substrings" into "duplicate
chunks", which an exact hash-groupBy catches — the sub-document
analog of exact dedup, the granularity SlimPajama-style corpus
cleaning works at.

Mechanics: at every end-position ``i`` (1-based) compute the
polynomial hash of the ``window`` characters ending at ``i``:
``h = sum(c_j * base^(window-1-j)) mod 2^32``; ``i`` is a cut iff
``h < 2^32 / divisor``. Expected chunk length = ``divisor``
characters (plus the window). The cut test is a THRESHOLD on the full
hash, not ``h % divisor == 0``: the modulus test only sees low bits,
and with base 257 ≡ 1 (mod 64) the low bits collapse to an
order-independent character sum (cut rate ~0 on real text); the
threshold reads the high bits, where the positional weights
``base^j mod 2^32`` actually mix (empirical cut rate 1/63.7 at
divisor 64 on random text). The hash is integer arithmetic on code points —
engine-reproducible, so the registry query built on it
(``doc_cdc_dedup``, queries.py) carries an exact DuckDB oracle.

The chunker runs as a vectorized numpy pass behind ``mapInPandas``
(Arrow-batched) — the documented exception to the expressions-first
policy, because Catalyst's higher-order functions evaluate the
windowed scan quadratically (see the note inside ``cdc_chunks``).
Cost is O(len * window) per document with window=8 — cheaper than
the MinHash shingle pass that typically runs beside it. The dedup
accounting on top stays pure JVM expressions.

Scale: chunking is embarrassingly parallel (per-row, no shuffle); the
dedup aggregate shuffles (hash(chunk), len) pairs — bounded by text
volume / expected-chunk-length rows, with map-side partial
aggregation. At 100 TB, prefer ``divisor`` 2-4 KiB (the dedup-storage
sweet spot) so the chunk-hash table is ~0.1% of corpus bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MOD = 1 << 32  # hash modulus: (acc*base + c) stays < 2^41, exact in BIGINT


def cdc_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    divisor: int = 64,
    base: int = 257,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Explode each document into content-defined chunks.

    Output: ``id_col``, ``*keep_cols``, ``chunk_idx`` (1-based),
    ``chunk_start`` (1-based), ``chunk_len``, ``chunk_text``. The last
    chunk always ends at the end of the text (position ``len`` is an
    unconditional cut), so chunks partition the document exactly.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    # Vectorized numpy pass behind mapInPandas (Arrow-batched), NOT a
    # column expression. This op is the documented exception to the
    # expressions-first policy (SCALE.md "Python boundary policy"):
    # the windowed hash needs one linear scan with per-position state,
    # and Catalyst's higher-order functions can't express that without
    # quadratic blowup — substring(text, p, 1) re-scans UTF-8 from the
    # start (O(len²·window)), a "precomputed" char-array alias is
    # inlined straight back into the per-element lambda
    # (CollapseProject), and a rolling-hash fold over a struct
    # accumulator re-materializes the accumulator per element (measured
    # ~O(len²), 67 s for one 20 KB doc). The numpy form is the same
    # hash — h(i) = Σ c_j·base^(w-1-j) mod 2^32 over the window ending
    # at i, cut iff h < 2^32/divisor — computed for ALL positions as
    # window-count shifted multiply-adds over the code-point array:
    # O(len·window) vectorized, ~1 ms for the same document.
    threshold = _MOD // divisor
    weights = [pow(base, window - 1 - j, _MOD) for j in range(window)]

    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            *[T.StructField(c, df.schema[c].dataType) for c in keep_cols],
            T.StructField("chunk_idx", T.IntegerType()),
            T.StructField("chunk_start", T.IntegerType()),
            T.StructField("chunk_len", T.IntegerType()),
            T.StructField("chunk_text", T.StringType()),
        ]
    )
    pass_cols = [id_col, *keep_cols]

    def chunk_batches(batches):
        for pdf in batches:
            out: dict[str, list] = {c: [] for c in pass_cols}
            out.update(chunk_idx=[], chunk_start=[], chunk_len=[], chunk_text=[])
            for row_i in range(len(pdf)):
                text = pdf[text_col].iat[row_i]
                text = "" if text is None else text
                n = len(text)
                # exact code points (what ascii() sees), vectorized
                codes = np.frombuffer(
                    text.encode("utf-32-le"), dtype=np.uint32
                ).astype(np.uint64)
                ends: list[int] = []
                if n - 1 >= window:
                    m = n - window + 1  # windows ending at 1-based w..n
                    h = np.zeros(m, dtype=np.uint64)
                    for j in range(window):
                        h = (h + codes[j : j + m] * weights[j]) % _MOD
                    # cut positions are window..n-1 (n is unconditional)
                    (ks,) = np.nonzero(h[:-1] < threshold)
                    ends = [int(k) + window for k in ks]
                ends.append(n)
                start = 1
                for idx, e in enumerate(ends, start=1):
                    for c in pass_cols:
                        out[c].append(pdf[c].iat[row_i])
                    out["chunk_idx"].append(idx)
                    out["chunk_start"].append(start)
                    out["chunk_len"].append(e - start + 1)
                    out["chunk_text"].append(text[start - 1 : e])
                    start = e + 1
            yield pd.DataFrame(out)

    return df.select(*pass_cols, text_col).mapInPandas(chunk_batches, out_schema)


def cdc_dedup_stats(chunks: DataFrame, group_col: str) -> DataFrame:
    """Per-group chunk dedup accounting.

    For each ``group_col`` value: total chunks, distinct chunks (by
    exact text), total characters, and distinct-chunk characters — the
    gap ``total_chunk_chars - distinct_chunk_chars`` is the volume an
    exact chunk-level dedup would remove within the group. Two
    aggregations: chunk-hash grain (map-side combined), then group
    grain.
    """
    per_chunk = chunks.groupBy(
        F.col(group_col), F.md5(F.col("chunk_text")).alias("__h")
    ).agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.min("chunk_len").alias("__len"),
    )
    return per_chunk.groupBy(group_col).agg(
        F.sum("__cnt").cast("long").alias("n_chunks"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_chunks"),
        F.sum(F.col("__cnt") * F.col("__len")).cast("long").alias("total_chunk_chars"),
        F.sum("__len").cast("long").alias("distinct_chunk_chars"),
    )


def cdc_sql(
    window: int = 8, divisor: int = 64, base: int = 257, group_col: str = "source"
) -> str:
    """DuckDB twin of ``cdc_dedup_stats(cdc_chunks(documents))``."""
    w1 = window - 1
    return f"""
    WITH d AS (
      SELECT doc_id, {group_col}, text, length(text) AS n FROM documents),
    e AS (
      SELECT doc_id, {group_col}, text,
        list_concat(
          CASE WHEN n - 1 >= {window} THEN
            list_filter(generate_series({window}, n - 1),
              i -> list_reduce(
                     list_prepend(CAST(0 AS BIGINT),
                       list_transform(generate_series(i - {w1}, i),
                         p -> CAST(ascii(substr(text, CAST(p AS INTEGER), 1))
                                   AS BIGINT))),
                     (acc, c) -> (acc * {base} + c) % {1 << 32}) < {(1 << 32) // divisor})
          ELSE CAST([] AS BIGINT[]) END,
          [CAST(n AS BIGINT)]) AS ends
      FROM d),
    c AS (
      SELECT {group_col}, u.ch AS chunk_text, length(u.ch) AS chunk_len
      FROM e, UNNEST(list_transform(generate_series(1, len(ends)),
        i -> substr(text,
               CAST(CASE WHEN i = 1 THEN 1 ELSE ends[CAST(i AS INTEGER) - 1] + 1
                    END AS INTEGER),
               CAST(ends[CAST(i AS INTEGER)]
                    - (CASE WHEN i = 1 THEN 1
                       ELSE ends[CAST(i AS INTEGER) - 1] + 1 END)
                    + 1 AS INTEGER)))) AS u(ch)),
    ph AS (
      SELECT {group_col}, md5(chunk_text) AS h, count(*) AS cnt,
             min(chunk_len) AS l
      FROM c GROUP BY 1, 2)
    SELECT {group_col},
           CAST(sum(cnt) AS BIGINT) AS n_chunks,
           CAST(count(*) AS BIGINT) AS n_distinct_chunks,
           CAST(sum(cnt * l) AS BIGINT) AS total_chunk_chars,
           CAST(sum(l) AS BIGINT) AS distinct_chunk_chars
    FROM ph GROUP BY 1
    """


def context_windows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 16,
    stride: int = 8,
) -> DataFrame:
    """Overlapping fixed-length token windows — the GPT-style training
    prep step that slices each document into ``window``-token contexts
    every ``stride`` tokens (the tail window may be shorter). Returns
    ``(id, win_idx, n_tokens, win_text)``.

    Implemented as a Spark 4 Python UDTF (table function) applied with
    ``DataFrame.lateralJoin`` — the idiomatic fan-out surface when one
    input row yields a variable number of typed output rows;
    ``useArrow=True`` batches rows over Arrow rather than pickling one
    at a time, and the DataFrame-native lateral join keeps the whole
    thing out of the session catalog (no temp views or function
    registrations to race or leak between concurrent callers). The
    UDTF is per-row work with no shuffle; whatever aggregation follows
    sees ~len/stride rows per document.

    (Python tokenization here is intentionally the same
    whitespace-split as functions.text.tokens, so SQL twins can
    reproduce windows with list_slice arithmetic.)
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="win_idx int, n_tokens int, win_text string",
          useArrow=True)
    class _Windows:
        def eval(self, text: str):
            toks = [t for t in (text or "").strip().split() if t]
            n = len(toks)
            if n == 0:
                return
            idx = 0
            for s in range(0, n, stride):
                w = toks[s:s + window]
                yield idx, len(w), " ".join(w)
                idx += 1

    # fan out an unsplittable scan before the per-row Python work
    # (round 11, guide §2.5): a single-row-group parquet input scans
    # as ONE task, serializing the UDTF on one core; at real scale the
    # scan has many splits and this is a no-op (see plans/scanout.py)
    from fugue_warehouses_spark.plans.scanout import fan_out_scan

    src = fan_out_scan(
        df.select(F.col(id_col), F.col(text_col)), id_col
    )
    return src.lateralJoin(
        _Windows(F.col(text_col).outer())
    ).select(id_col, "win_idx", "n_tokens", "win_text")
