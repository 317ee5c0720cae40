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

Everything here is column expressions (nested higher-order functions:
``filter`` over positions, ``aggregate`` over the window) — JVM-side,
whole-stage-codegen, no Python in the hot path. Cost is
O(len * window) per document with window=8 — cheaper than the
MinHash shingle pass that typically runs beside it.

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
    text = F.col(text_col)
    n = F.length(text)

    def window_hash(i):  # poly hash of text[i-window+1 .. i], mod 2^32
        return F.aggregate(
            F.sequence(i - (window - 1), i),
            F.lit(0).cast("long"),
            lambda acc, p: (acc * base + F.ascii(F.substring(text, p, 1)))
            % F.lit(_MOD),
        )

    threshold = _MOD // divisor
    interior = F.when(
        n - 1 >= window,
        F.filter(
            F.sequence(F.lit(window), n - 1),
            lambda i: window_hash(i) < threshold,
        ),
    ).otherwise(F.array().cast("array<int>"))
    ends = F.concat(interior, F.array(n))

    idx = F.sequence(F.lit(1), F.size(ends))
    bounds = F.transform(
        idx,
        lambda i: F.struct(
            i.alias("chunk_idx"),
            F.when(i == 1, F.lit(1))
            .otherwise(F.element_at(ends, (i - 1).cast("int")) + 1)
            .alias("chunk_start"),
            F.element_at(ends, i.cast("int")).alias("chunk_end"),
        ),
    )

    exploded = df.select(
        F.col(id_col), *[F.col(c) for c in keep_cols], text, F.explode(bounds).alias("b")
    )
    start = F.col("b.chunk_start")
    clen = F.col("b.chunk_end") - start + 1
    return exploded.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        F.col("b.chunk_idx").alias("chunk_idx"),
        start.alias("chunk_start"),
        clen.alias("chunk_len"),
        F.substring(text, start, clen).alias("chunk_text"),
    )


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
