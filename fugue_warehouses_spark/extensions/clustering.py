"""Embedding clustering: Lloyd k-means and cluster-bucketed semantic
dedup (SemDeDup-style, Abbas et al. 2023).

Spark-first shapes:

- **assignment** is one Arrow ``mapInPandas`` pass per iteration — a
  (batch × dim) @ (dim × k) BLAS matmul with the centroid matrix riding
  in the UDF closure (k × dim doubles, broadcast-by-closure). The
  corpus never shuffles to be assigned.
- **centroid update** is ``posexplode`` → hash aggregate on
  (cluster, dim-pos) with map-side combine — the shuffled volume is
  k × dim partial sums per partition, not the corpus.
- **semantic dedup** joins vectors only *within* a cluster bucket
  (hash-partitioned self-join on cidx), the same
  candidates-not-all-pairs discipline as the MinHash/SRP-LSH dedup
  family (extensions/dedup.py, similarity.py).

Determinism discipline (what makes these oracle-checkable, unlike
classic sampled k-means): init centroids are the k smallest-id vectors
(or the md5-hash sample for dedup, mirroring ivf_topk_hash), every
cosine is rounded to 6 before any argmax/threshold, ties break on the
lowest centroid index / id. np.argmax takes the first max, which is
exactly the oracle's ``ORDER BY sim DESC, cidx ASC``.

Reference parity note: fugue-warehouses has no clustering layer (it
delegates to warehouse SQL); this extends SURVEY.md §2.E for the
LLM-pipeline story.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fugue_warehouses_spark.functions.vectors import cosine


def _normalize_rows(mat: np.ndarray) -> np.ndarray:
    nr = np.linalg.norm(mat, axis=1, keepdims=True)
    nr[nr == 0] = 1.0
    return mat / nr


def assign_to_centroids(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    cmat: np.ndarray,
    keep_cols: tuple[str, ...] = (),
    labels: np.ndarray | None = None,
) -> DataFrame:
    """Best centroid per vector by rounded cosine (ties -> lowest
    centroid index). One Arrow pass; output keeps the vector for
    downstream re-use (update step / dedup re-rank).

    ``labels`` maps matrix rows to emitted ``cidx`` values (defaults
    to row position); kmeans_lloyd uses it to preserve original
    cluster ids after empty clusters are dropped mid-iteration."""
    cmat = np.asarray(cmat, dtype="float64")
    if cmat.size == 0:
        raise ValueError("empty centroid matrix (empty corpus?)")
    label_arr = (
        np.arange(len(cmat), dtype="int32")
        if labels is None
        else np.asarray(labels, dtype="int32")
    )
    cmat_n = _normalize_rows(cmat)
    schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            *[T.StructField(c, df.schema[c].dataType) for c in keep_cols],
            T.StructField(vec_col, df.schema[vec_col].dataType),
            T.StructField("cidx", T.IntegerType()),
            T.StructField("cos_sim", T.DoubleType()),
        ]
    )

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            sims = np.round(_normalize_rows(m) @ cmat_n.T, 6)
            best = sims.argmax(axis=1)
            out = {id_col: pdf[id_col]}
            for c in keep_cols:
                out[c] = pdf[c]
            out[vec_col] = pdf[vec_col]
            out["cidx"] = label_arr[best]
            out["cos_sim"] = sims[np.arange(len(best)), best]
            yield pd.DataFrame(out)

    return df.select(id_col, *keep_cols, vec_col).mapInPandas(assign, schema)


def kmeans_lloyd(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 2,
    keep_cols: tuple[str, ...] = (),
) -> tuple[DataFrame, np.ndarray]:
    """Lloyd k-means with deterministic smallest-id init.

    ``iters`` counts assignment passes: iters=2 is assign → update →
    assign. Returns (assignment frame, final centroid matrix). The
    driver holds only k × dim doubles per round — the classic
    MLlib-style control loop; all data-sized work is distributed.

    Cosine-metric Lloyd: assignment by max cosine, update by
    (unnormalized) coordinate mean of members. A cluster that ends an
    assignment pass with no members is DROPPED from the next pass
    (matching the SQL twin, whose update CTE only emits clusters with
    members) while surviving clusters keep their original ``cidx``.
    With distinct init vectors every cluster is non-empty (each init
    centroid is a member that assigns to itself at cosine 1.0), but
    duplicate — or rounded-cosine-tied — init vectors send all ties to
    the lowest index, leaving the higher-indexed twin empty; dropping
    it keeps both engines on the same centroid set.
    """
    init = df.orderBy(id_col).limit(k).select(id_col, vec_col).collect()
    cmat = np.array([list(r[vec_col]) for r in init], dtype="float64")
    labels = np.arange(len(cmat), dtype="int32")
    for _ in range(max(0, iters - 1)):
        assigned = assign_to_centroids(df, id_col, vec_col, cmat, labels=labels)
        upd = (
            assigned.select(
                "cidx",
                F.posexplode(F.col(vec_col).cast("array<double>")).alias(
                    "pos", "val"
                ),
            )
            .groupBy("cidx", "pos")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        present = sorted({r["cidx"] for r in upd})
        pos_of = {c: i for i, c in enumerate(present)}
        new = np.zeros((len(present), cmat.shape[1]), dtype="float64")
        for r in upd:
            new[pos_of[r["cidx"]]][r["pos"]] = r["m"]
        cmat = new
        labels = np.array(present, dtype="int32")
    return (
        assign_to_centroids(df, id_col, vec_col, cmat, keep_cols, labels=labels),
        cmat,
    )


def hash_centroid_matrix(
    df: DataFrame, id_col: str, vec_col: str, n_centroids: int
) -> np.ndarray:
    """The n_centroids vectors with the smallest (md5(id), id) key —
    ivf_topk_hash's deterministic uniform sample (similarity.py), as a
    driver-side matrix."""
    rows = (
        df.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(n_centroids)
        .collect()
    )
    return np.array([list(r[vec_col]) for r in rows], dtype="float64")


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    n_centroids: int = 32,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """SemDeDup: drop any vector that has a lower-id near-duplicate
    (rounded cosine >= threshold) in its cluster bucket.

    Candidate pairs come only from within a bucket — at 100 TB the
    pair count is sum over clusters of n_c², tuned by n_centroids,
    never the global all-pairs square. Adds a boolean ``is_dup``.
    Like all LSH-family dedup, cross-bucket near-dups are missed by
    design; recall is a function of n_centroids (more buckets = faster
    + lower recall), verified in tests against exact all-pairs.
    """
    cmat = hash_centroid_matrix(df, id_col, vec_col, n_centroids)
    a = assign_to_centroids(df, id_col, vec_col, cmat, keep_cols=keep_cols)
    left = a.select(
        F.col("cidx"), F.col(id_col).alias("__id_a"), F.col(vec_col).alias("__va")
    )
    right = a.select(
        F.col("cidx"), F.col(id_col).alias("__id_b"), F.col(vec_col).alias("__vb")
    )
    dup_ids = (
        left.join(right, "cidx")
        .filter(F.col("__id_a") < F.col("__id_b"))
        .withColumn(
            "__cos", F.round(cosine(F.col("__va"), F.col("__vb")), 6)
        )
        .filter(F.col("__cos") >= threshold)
        .select(F.col("__id_b").alias(id_col))
        .distinct()
    )
    return a.select(id_col, *keep_cols, "cidx").join(
        dup_ids.withColumn("__dup", F.lit(True)), id_col, "left"
    ).select(
        id_col,
        *keep_cols,
        "cidx",
        F.coalesce("__dup", F.lit(False)).alias("is_dup"),
    )


def label_centroid_outliers(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    threshold: float = 0.0,
    round_digits: int = 6,
) -> DataFrame:
    """Per-label semantic outlier gate: score every vector by cosine to
    its OWN label's centroid and count the ones below ``threshold`` —
    the standard mislabel/noise screen before contrastive training (a
    vector pointing away from its class centroid is either mislabeled
    or garbage).

    Output: (label, n_vecs, n_outliers, avg_cos_centroid).

    Plan: posexplode to (label, dim, x) -> per-dim avg (ONE shuffle on
    (label, dim), map-side partial agg — the centroid never exists as
    a driver object) -> re-assemble the centroid array per label
    (k·dim rows — tiny) -> broadcast-join centroids back and score
    with a pure JVM zip_with/aggregate cosine -> final k-row agg.
    Centroid components round at ``round_digits`` BEFORE scoring so
    the whole chain is reproducible cross-engine despite avg()'s
    summation order."""
    d = df.select(
        F.col(label_col).alias("__lbl"),
        F.posexplode(F.col(vec_col)).alias("__pos", "__x"),
    )
    cent = d.groupBy("__lbl", "__pos").agg(
        F.round(F.avg(F.col("__x").cast("double")), round_digits).alias("__c")
    )
    cvec = cent.groupBy("__lbl").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("__pos", "__c"))),
            lambda s: s["__c"],
        ).alias("__cv")
    )
    scored = df.join(
        F.broadcast(cvec), F.col(label_col) == F.col("__lbl")
    ).withColumn(
        "__cos",
        F.round(
            cosine(
                F.transform(F.col(vec_col), lambda x: x.cast("double")),
                F.col("__cv"),
            ),
            round_digits,
        ),
    )
    return scored.groupBy(F.col(label_col)).agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum((F.col("__cos") < threshold).cast("bigint")).alias("n_outliers"),
        F.round(F.avg("__cos"), round_digits).alias("avg_cos_centroid"),
    )
