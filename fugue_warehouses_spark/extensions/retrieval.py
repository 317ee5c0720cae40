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
    from fugue_warehouses_spark.plans.scanout import fan_out_scan

    # fan out the 2-column corpus projection when the scan is
    # under-parallel (round 12, guide §2.5): the tokenize split runs
    # in the scan stage for BOTH the doclen projection and the tf
    # explode, serially over a single-row-group input; the exchange is
    # shared by the two branches (ReuseExchange) and is a no-op at
    # real scan parallelism.
    df = fan_out_scan(df.select(F.col(id_col), F.col(text_col)), id_col)
    # doc length as a per-row projection (round 11, guide §2.4 /
    # §1.2 "fewer passes": retrieval_eval already computed it this
    # way) — size of the token array, no second explode+groupBy pass
    # over the corpus. Docs with zero tokens are excluded exactly as
    # the explode+count form excluded them (they produced no rows).
    doclen = df.select(
        F.col(id_col), F.size(tokens(text_col)).alias("__dl")
    ).where(F.col("__dl") > 0)
    stats = doclen.agg(
        F.count("*").alias("__n"), F.avg("__dl").alias("__avgdl")
    )
    tf = (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("__t"))
        .filter(F.col("__t").isin(*query_terms))
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


def retrieval_eval(
    df: DataFrame,
    id_col: str,
    text_col: str,
    queries: list[tuple[str, list[str]]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Rank-quality evaluation of the BM25 ranking against graded
    pseudo-relevance — the eval leg of the retrieval family (index /
    scorer changes need a regression number, not eyeballs).

    Truth: ``rel(q, d) = Σ_{t∈q} tf(t, d)`` (uncapped term-hit mass) —
    the standard pseudo-label when no human judgments exist; BM25's
    k1 tf-saturation and length normalization genuinely disagree with
    it, so the metrics discriminate. Per query:

    - ``mrr``: 1/rank of the first argmax-relevance doc in the BM25
      order, 0 if it is outside the top ``k``;
    - ``ndcg``: DCG@k of the BM25 order over gains ``rel`` divided by
      the ideal (rel-sorted) DCG@k;
    - ``best_at_k``: fraction of the top ``k`` that are
      argmax-relevance docs;
    - ``max_rel`` / ``n_matched``: label stats for the denominator.

    Ranks use ``round(score, 6) DESC, id`` exactly like
    ``bm25_scores``'s consumers, so the order is cross-engine
    deterministic. Plan shape: ONE wordcount pass (the posting lists
    of the probe terms — never the corpus — flow into scoring); then
    NO matched-set-sized window anywhere — a ``PARTITION BY query``
    window would serialize each query's whole matched set through one
    task (at web scale a common term matches 10^8 docs). Instead:
    DCG/best@k come from a TWO-PHASE bounded top-k (per-partition
    top-k candidates — provably a superset of the global top-k —
    then an exact window over the ≤ #partitions·k·#queries candidate
    rows), and MRR's first-best rank is computed as a count-above
    aggregate against the per-query argmax row (broadcast,
    #queries-sized), which is exact at ANY rank without ranking
    anything.
    """
    if not queries:
        raise ValueError("queries must be non-empty")
    from pyspark.sql.window import Window

    spark = df.sparkSession
    all_terms = sorted({t for _, ts in queries for t in ts})
    # one-slice local frame: a handful of probe terms otherwise
    # parallelize into defaultParallelism near-empty slices — a no-op
    # task (and a Python-runner round) per slice per read
    from fugue_warehouses_spark.plans.localframe import local_frame

    qterms = local_frame(
        spark,
        [(qid, t) for qid, ts in queries for t in ts],
        "qid string, term string",
    )
    # fan out the 2-column corpus projection when the scan is
    # under-parallel (round 12, guide §2.5) — the tokenize split
    # otherwise runs serially in one-task scan stages for both the
    # doclen and tf branches; shared via ReuseExchange, no-op at real
    # scan parallelism
    from fugue_warehouses_spark.plans.scanout import fan_out_scan

    df = fan_out_scan(df.select(F.col(id_col), F.col(text_col)), id_col)
    # doc length as a per-row projection (size of the token array) —
    # no second explode+aggregate pass over the corpus; empty docs are
    # excluded exactly as the explode form would
    doclen = df.select(
        F.col(id_col), F.size(tokens(text_col)).alias("__dl")
    ).where(F.col("__dl") > 0)
    stats = doclen.agg(
        F.count("*").alias("__n"), F.avg("__dl").alias("__avgdl")
    )
    tf = (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("__t"))
        .filter(F.col("__t").isin(*all_terms))
        .groupBy(id_col, "__t")
        .agg(F.count("*").alias("__tf"))
    )
    dfreq = tf.groupBy("__t").agg(F.count("*").alias("__df"))
    hits = (
        qterms.withColumnRenamed("term", "__t")
        .join(tf, "__t")
        .join(F.broadcast(dfreq), "__t")
        .join(doclen, id_col)
        .join(F.broadcast(stats))
    )
    idf = F.log(
        (F.col("__n") - F.col("__df") + 0.5) / (F.col("__df") + 0.5) + 1.0
    )
    denom = F.col("__tf") + k1 * (
        1.0 - b + b * F.col("__dl") / F.col("__avgdl")
    )
    scored = hits.groupBy("qid", id_col).agg(
        F.round(
            F.sum(idf * (F.col("__tf") * (k1 + 1.0)) / denom), 6
        ).alias("score"),
        F.sum("__tf").cast("int").alias("rel"),
    )
    # eager: the five downstream consumers (mx/best/first_best/two
    # top-k legs) must all read the materialized blocks — a lazy
    # checkpoint materializing under concurrent jobs emits spurious
    # 'non-existent accumulator' scheduler errors. (A
    # repartition("qid") here was considered and REJECTED in round 11:
    # it would funnel each query's whole matched set through one task
    # at materialization — the serialization this operator exists to
    # avoid.)
    scored = scored.localCheckpoint()
    log2 = lambda c: F.log(c) / F.log(F.lit(2.0))  # noqa: E731

    def _topk(by: list, ascending: list) -> DataFrame:
        """Two-phase bounded top-k per qid: per-Arrow-batch top-k
        (a superset of each partition's top-k, hence of the global
        top-k), then the exact window over the reduced candidates."""
        cols = list(scored.columns)

        def part(batches):
            for pdf in batches:
                yield (
                    pdf.sort_values(by=by, ascending=ascending)
                    .groupby("qid", sort=False)
                    .head(k)
                )

        cand = scored.mapInPandas(part, scored.schema)
        w = Window.partitionBy("qid").orderBy(
            *[
                F.col(c).asc() if a else F.col(c).desc()
                for c, a in zip(by, ascending)
            ]
        )
        return (
            cand.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .select(*cols, "__rn")
        )

    # ONE aggregate for max-rel, match count AND the per-query best
    # row (round 11, guide §2.4 "do fewer shuffles"): the previous
    # shape ran three chained aggregation branches (mx -> filter ->
    # best_score -> filter -> best) with two broadcast joins — three
    # extra passes over the matched sets and ~5 extra exchanges. The
    # best row is the lexicographic min of (-rel, -score, id): rows
    # sorted by rel DESC, score DESC, id ASC — exactly the two-step
    # filter semantics (argmax rel, then max score, then min id), as
    # one partial-aggregating struct-min. rel is int and score double,
    # so negation is exact; id keeps its own ASC direction inside the
    # struct. (The old two-step form existed for non-numeric id
    # columns — id is NOT negated here, so that still holds.)
    mx = scored.groupBy("qid").agg(
        F.max("rel").alias("__max_rel"),
        F.count("*").alias("__n_matched"),
        F.min(
            F.struct(
                (-F.col("rel")).alias("__nr"),
                (-F.col("score")).alias("__ns"),
                F.col(id_col).alias("__id"),
            )
        ).alias("__best"),
    )
    best = mx.select(
        "qid",
        (-F.col("__best.__ns")).alias("__bs"),
        F.col("__best.__id").alias("__bid"),
    )
    mx = mx.drop("__best")
    # MRR without ranking: the argmax-relevance doc's exact rank is
    # 1 + count of rows ordered above it — an aggregate against the
    # broadcast per-query best row, exact at any rank.
    first_best = (
        scored.join(F.broadcast(best), "qid")
        .groupBy("qid")
        .agg(
            (
                F.sum(
                    F.when(
                        (F.col("score") > F.col("__bs"))
                        | (
                            (F.col("score") == F.col("__bs"))
                            & (F.col(id_col) < F.col("__bid"))
                        ),
                        1,
                    ).otherwise(0)
                )
                + 1
            ).alias("__first_best")
        )
    )
    sys_top = _topk(["score", id_col], [False, True]).join(
        F.broadcast(mx), "qid"
    )
    m = (
        sys_top.groupBy("qid")
        .agg(
            F.sum(F.col("rel") / log2(F.col("__rn") + 1.0)).alias("__dcg"),
            F.sum(
                F.when(F.col("rel") == F.col("__max_rel"), 1).otherwise(0)
            )
            .cast("long")
            .alias("__best_in_top"),
        )
        .join(first_best, "qid")
        .join(
            mx.select(
                "qid",
                F.col("__max_rel").cast("long").alias("max_rel"),
                F.col("__n_matched").cast("long").alias("n_matched"),
            ),
            "qid",
        )
    )
    i = _topk(["rel", id_col], [False, True]).groupBy("qid").agg(
        F.sum(F.col("rel") / log2(F.col("__rn") + 1.0)).alias("__idcg")
    )
    return (
        m.join(i, "qid")
        .select(
            F.col("qid").alias("query"),
            F.round(
                F.when(
                    F.col("__first_best").isNull()
                    | (F.col("__first_best") > k),
                    0.0,
                ).otherwise(1.0 / F.col("__first_best")),
                6,
            ).alias("mrr"),
            F.round(F.col("__dcg") / F.col("__idcg"), 6).alias("ndcg"),
            F.round(F.col("__best_in_top") / float(k), 6).alias("best_at_k"),
            "max_rel",
            "n_matched",
        )
        .orderBy("query")
    )


def retrieval_eval_sql(
    queries: list[tuple[str, list[str]]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB twin of ``retrieval_eval`` over ``documents``."""
    vals = ", ".join(
        f"('{qid}', '{t}')" for qid, ts in queries for t in ts
    )
    return rf"""
    WITH qterms(qid, term) AS (VALUES {vals}),
    toks AS (
      SELECT doc_id, tok FROM documents,
        UNNEST(string_split_regex(trim(text), '\s+')) AS u(tok)
      WHERE tok <> ''),
    doclen AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM doclen),
    tf AS (
      SELECT doc_id, tok, count(*) AS tf FROM toks
      WHERE tok IN (SELECT DISTINCT term FROM qterms)
      GROUP BY doc_id, tok),
    dfreq AS (SELECT tok, count(*)::DOUBLE AS df FROM tf GROUP BY tok),
    hits AS (
      SELECT q.qid, tf.doc_id, tf.tf, tf.tok, dfreq.df, doclen.dl
      FROM qterms q JOIN tf ON tf.tok = q.term
      JOIN dfreq USING (tok) JOIN doclen USING (doc_id)),
    scored AS (
      SELECT qid, doc_id,
             round(sum(ln(((SELECT n FROM stats) - df + 0.5)
                          / (df + 0.5) + 1.0)
                 * (tf * ({k1} + 1.0))
                 / (tf + {k1} * (1.0 - {b} + {b} * dl
                                 / (SELECT avgdl FROM stats)))), 6)
               AS score,
             sum(tf)::INT AS rel
      FROM hits GROUP BY qid, doc_id),
    mx AS (SELECT qid, max(rel) AS max_rel FROM scored GROUP BY qid),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY qid
                                   ORDER BY score DESC, doc_id) AS rn
      FROM scored),
    ideal AS (
      SELECT qid, rel, row_number() OVER (PARTITION BY qid
                                          ORDER BY rel DESC, doc_id) AS rn
      FROM scored),
    m AS (
      SELECT r.qid,
             min(CASE WHEN r.rel = mx.max_rel THEN r.rn END) AS first_best,
             sum(CASE WHEN r.rn <= {k}
                      THEN r.rel / log2(r.rn + 1.0) ELSE 0 END) AS dcg,
             sum(CASE WHEN r.rn <= {k} AND r.rel = mx.max_rel
                      THEN 1 ELSE 0 END)::BIGINT AS best_in_top,
             max(mx.max_rel)::BIGINT AS max_rel,
             count(*)::BIGINT AS n_matched
      FROM ranked r JOIN mx ON mx.qid = r.qid GROUP BY r.qid),
    i AS (
      SELECT qid, sum(CASE WHEN rn <= {k}
                           THEN rel / log2(rn + 1.0) ELSE 0 END) AS idcg
      FROM ideal GROUP BY qid)
    SELECT m.qid AS query,
           round(CASE WHEN m.first_best IS NULL OR m.first_best > {k}
                      THEN 0.0 ELSE 1.0 / m.first_best END, 6) AS mrr,
           round(m.dcg / i.idcg, 6) AS ndcg,
           round(m.best_in_top / {k}.0, 6) AS best_at_k,
           m.max_rel, m.n_matched
    FROM m JOIN i USING (qid)
    ORDER BY query
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
