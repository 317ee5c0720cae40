"""Lexical retrieval over the corpus: BM25 scoring as pure
aggregates — the search side of a data-curation stack (find documents
matching a probe query in a deduped corpus, audit leakage, build
retrieval baselines).

BM25 (Robertson–Spärck Jones; the Okapi formulation):

    score(d, q) = Σ_{t ∈ q} idf(t) · tf(t,d)·(k1+1)
                              / (tf(t,d) + k1·(1 - b + b·|d|/avgdl))
    idf(t) = ln( (N - df(t) + 0.5) / (df(t) + 0.5) + 1 )

Everything is one wordcount-shaped pass over the corpus:

1. token explode → per-(doc, term) tf (map-side combined);
2. df per term and N/avgdl as tiny aggregates — all broadcast;
3. the probe terms filter the tf stream BEFORE any join fan-out
   (an IN filter on a handful of terms — at 100 TB the posting list,
   not the corpus, flows into scoring);
4. one final per-doc aggregate sums the per-term contributions.

No Python anywhere; ln() differs across engines by ≤ 1 ulp, absorbed
by 6-dp rounding (same discipline as unigram surprisal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fugue_warehouses_spark.functions.text import tokens


def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Per-document BM25 score for the probe ``query_terms``.

    Output: (id, score) for documents matching at least one term.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    toks = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("__t")
    )
    doclen = toks.groupBy(id_col).agg(F.count("*").alias("__dl"))
    stats = doclen.agg(
        F.count("*").alias("__n"), F.avg("__dl").alias("__avgdl")
    )
    tf = (
        toks.filter(F.col("__t").isin(*query_terms))
        .groupBy(id_col, "__t")
        .agg(F.count("*").alias("__tf"))
    )
    dfreq = tf.groupBy("__t").agg(F.count("*").alias("__df"))
    scored = (
        tf.join(F.broadcast(dfreq), "__t")
        .join(doclen, id_col)
        .join(F.broadcast(stats))
    )
    idf = F.log(
        (F.col("__n") - F.col("__df") + 0.5) / (F.col("__df") + 0.5) + 1.0
    )
    denom = F.col("__tf") + k1 * (
        1.0 - b + b * F.col("__dl") / F.col("__avgdl")
    )
    contrib = idf * (F.col("__tf") * (k1 + 1.0)) / denom
    return scored.groupBy(id_col).agg(F.sum(contrib).alias("score"))


def bm25_sql(
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 20,
) -> str:
    """DuckDB twin of ``bm25_scores`` over ``documents`` + top-n."""
    terms = ", ".join(f"'{t}'" for t in query_terms)
    return rf"""
    WITH toks AS (
      SELECT doc_id, tok FROM documents,
        UNNEST(string_split_regex(trim(text), '\s+')) AS u(tok)
      WHERE tok <> ''),
    doclen AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (
      SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM doclen),
    tf AS (
      SELECT doc_id, tok, count(*) AS tf FROM toks
      WHERE tok IN ({terms}) GROUP BY doc_id, tok),
    dfreq AS (SELECT tok, count(*)::DOUBLE AS df FROM tf GROUP BY tok),
    scored AS (
      SELECT tf.doc_id,
             sum(ln(((SELECT n FROM stats) - dfreq.df + 0.5)
                    / (dfreq.df + 0.5) + 1.0)
                 * (tf.tf * ({k1} + 1.0))
                 / (tf.tf + {k1} * (1.0 - {b} + {b} * doclen.dl
                                    / (SELECT avgdl FROM stats))))
               AS score
      FROM tf JOIN dfreq USING (tok) JOIN doclen USING (doc_id)
      GROUP BY tf.doc_id)
    SELECT doc_id, round(score, 6) AS bm25
    FROM scored
    ORDER BY round(score, 6) DESC, doc_id
    LIMIT {top_n}
    """


def tfidf_keywords(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    k: int = 3,
    round_digits: int = 6,
) -> DataFrame:
    """Top-``k`` TF-IDF keywords per group — the cheap descriptive
    profile of what distinguishes each slice of a corpus (and the
    building block of sparse retrieval beside BM25).

    tf = term count within the group; idf = ln(N_groups / df) with df
    the number of groups containing the term. Scores round before
    ranking and ties break on the token, so the top-k is deterministic
    cross-engine. Plan: token explode -> (group, token) count with
    map-side combine -> token-level df agg (bounded by vocabulary,
    joined back broadcast) -> per-group window on the tiny
    (group, token) frame. Nothing driver-side; the 1-row group count
    rides a broadcast cross join."""
    toks = df.select(
        F.col(group_col).alias("__g"),
        F.explode(tokens(text_col)).alias("__tok"),
    )
    tf = toks.groupBy("__g", "__tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("__tok").agg(F.count(F.lit(1)).alias("__df"))
    ngroups = df.select(F.countDistinct(group_col).alias("__n"))
    scored = (
        tf.join(F.broadcast(dfreq), "__tok")
        .crossJoin(F.broadcast(ngroups))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * F.log(F.col("__n").cast("double") / F.col("__df")),
                round_digits,
            ),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("__g").orderBy(
        F.col("score").desc(), F.col("__tok").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(
            F.col("__g").alias(group_col),
            F.col("__tok").alias("token"),
            "tf",
            "score",
        )
    )
