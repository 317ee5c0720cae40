"""Similarity search over embedding columns (array<float>).

North-star extension (SURVEY.md §2.E). Two paths:

- ``brute_force_topk`` — exact cosine top-k. The query set is
  broadcast (it's the small side by construction), so the corpus is
  scanned once with no shuffle; ranking is a per-query window. This is
  the correctness baseline and is DuckDB-verifiable.
- ``lsh_topk`` — random-hyperplane (SRP) LSH: sign-bit signatures
  bucket the corpus; only bucket collisions are re-ranked exactly.
  The scale path: candidate generation is one shuffle on
  (table, bucket), exact math only on collisions. Hyperplanes are
  derived deterministically from a seed via sha256 (``srp_planes``) —
  no RNG state, reproducible across runs/executors AND replayable in
  plain SQL, so the whole pipeline has an exact DuckDB oracle twin.

All vector math is double-precision, fixed accumulation order
(functions/vectors.py) so results are engine-comparable.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fugue_warehouses_spark.functions.vectors import cosine, dot, l2_normalize, norm


# one live broadcast per call site: these functions run once per
# micro-batch in the streaming ingest, and an un-released broadcast
# of the query matrix (+cell lists — tens of MB at probe scale)
# accumulates on driver and executors until Python GC happens to drop
# the handle (round-8 ADVICE fix). unpersist (NOT destroy) keeps a
# rotated-out broadcast usable: a still-live frame that re-executes
# just re-ships it from the driver.
#
# Concurrency contract (round-9 ADVICE fix): rotation is atomic under
# _BC_LOCK — foreachBatch callbacks run on stream-execution threads,
# and an unlocked pop/insert pair could drop a broadcast handle
# entirely under interleaving. The slot itself remains ONE per site by
# design: TWO streaming queries sharing a site in one process will
# rotate each other's broadcast every micro-batch — correct (a
# rotated-out broadcast re-ships from the driver on use) but the
# per-executor caching degrades to per-batch re-shipping. Run one
# streaming query per site per process to keep the caching; keying by
# query thread was rejected because dead stream threads would pin
# their last broadcast forever — the very leak rotation exists to end.
_LIVE_BROADCASTS: dict = {}
_BC_LOCK = threading.Lock()


def _rotate_broadcast(sc, site: str, value):
    bc = sc.broadcast(value)
    with _BC_LOCK:
        old = _LIVE_BROADCASTS.get(site)
        _LIVE_BROADCASTS[site] = bc
    if old is not None:
        try:
            old.unpersist(blocking=False)
        except Exception:
            pass
    return bc


def _collect_query_matrix(queries: DataFrame, query_id: str, query_vec: str):
    """Driver-side collect of the (small) query set into a normalized
    float64 matrix. Query sets are bounded by contract (top-k search);
    the corpus side never leaves the executors."""
    import numpy as np

    rows = queries.select(query_id, query_vec).collect()
    # no dtype coercion on ids: string/decimal id columns must survive
    ids = np.asarray([r[0] for r in rows])
    if len(rows) == 0:
        return ids, np.zeros((0, 0), dtype="float64")
    mat = np.array([list(r[1]) for r in rows], dtype="float64")
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return ids, mat / norms


def _topk_scaffold(
    corpus: DataFrame,
    corpus_select: list,
    schema,
    score_field: str,
    qids,
    k: int,
    round_digits: int | None,
    batch_compute,
    candidate_mask,
    extra_fields: tuple = (),
) -> DataFrame:
    """Shared collect/score/rank pipeline behind ``brute_force_topk``,
    ``hard_negative_topk`` and ``quantization.quantized_topk`` (one
    implementation so empty-input and masking semantics can't drift):
    the corpus streams through one Arrow ``mapInPandas`` pass;
    ``batch_compute(pdf) -> (ids, sims[batch, n_q], extras)`` scores a
    batch, ``candidate_mask(j, ids, extras)`` picks the valid
    candidates for query ``j``; each batch emits its local top-k per
    query (deterministic (-score, id) lexsort) and a final window
    keeps the global top-k. An empty query set short-circuits to an
    empty-but-typed frame (no job)."""
    import numpy as np
    import pandas as pd

    out_names = [f.name for f in schema.fields]
    if len(qids) == 0:
        return corpus.sparkSession.createDataFrame([], schema)

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, sims, extras = batch_compute(pdf)
            if round_digits is not None:
                sims = np.round(sims, round_digits)
            cols: dict = {name: [] for name in out_names}
            for j in range(len(qids)):
                col = sims[:, j]
                cand = np.nonzero(candidate_mask(j, ids, extras))[0]
                if len(cand) == 0:
                    continue
                order = np.lexsort((ids[cand], -col[cand]))[:k]
                sel = cand[order]
                cols["query_id"].extend([qids[j]] * len(sel))
                cols["match_id"].extend(ids[sel].tolist())
                for name in extra_fields:
                    cols[name].extend(extras[name][sel].tolist())
                cols[score_field].extend(col[sel].tolist())
            yield pd.DataFrame(cols)

    scored = corpus.select(*corpus_select).mapInPandas(score, schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col(score_field).desc(), F.col("match_id").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(*out_names)
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "vec_id",
    query_vec: str = "embedding",
    round_digits: int | None = 6,
    use_numpy: bool = True,
) -> DataFrame:
    """Exact cosine top-k: (query_id, match_id, cosine_sim), k rows per query.

    Ties broken by match_id ascending (deterministic). ``round_digits``
    rounds the similarity *before* ranking so rank order is stable
    across engines with different summation order.

    Default path: the query set is collected as a normalized float64
    matrix and shipped in the UDF closure; each Arrow batch of the
    corpus does one BLAS matmul and emits its local top-k per query; a
    final window keeps the global top-k (~50x faster than per-pair
    expression math, measured at sf0.1; the corpus still streams with
    no shuffle before the tiny candidate set). ``use_numpy=False``
    keeps everything JVM-side as pure expressions.
    """
    if use_numpy:
        return _topk_numpy(
            corpus, queries, k, corpus_id, corpus_vec, query_id, query_vec,
            round_digits,
        )
    # normalize each side once; the per-pair work is then a single dot
    # (1 fused zip_with/aggregate pass instead of 3)
    q = queries.select(
        F.col(query_id).alias("query_id"),
        l2_normalize(query_vec).alias("__qv"),
    )
    c = corpus.select(
        F.col(corpus_id).alias("match_id"),
        l2_normalize(corpus_vec).alias("__cv"),
    )
    sim = dot(F.col("__qv"), F.col("__cv"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("match_id"))
        .withColumn("cosine_sim", sim)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("match_id").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("query_id", "match_id", "cosine_sim")
    )


def _topk_numpy(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    corpus_id: str,
    corpus_vec: str,
    query_id: str,
    query_vec: str,
    round_digits: int | None,
) -> DataFrame:
    import numpy as np
    from pyspark.sql import types as T

    qids, qmat = _collect_query_matrix(queries, query_id, query_vec)
    schema = T.StructType(
        [
            T.StructField("query_id", queries.schema[query_id].dataType),
            T.StructField("match_id", corpus.schema[corpus_id].dataType),
            T.StructField("cosine_sim", T.DoubleType()),
        ]
    )

    def compute(pdf):
        ids = pdf[corpus_id].to_numpy()
        mat = np.stack(pdf[corpus_vec].to_numpy()).astype("float64")
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        return ids, (mat / norms) @ qmat.T, {}

    return _topk_scaffold(
        corpus,
        [corpus_id, corpus_vec],
        schema,
        "cosine_sim",
        qids,
        k,
        round_digits,
        compute,
        lambda j, ids, extras: ids != qids[j],
    )


def _plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for a frame — plan statistics only
    (file sizes for scans, propagated through the operators); no job
    runs and nothing is collected. Falls back to "huge" when stats are
    unavailable so auto-selection degrades to the scale-safe path."""
    try:
        size = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        return int(size if isinstance(size, int) else size.toString())
    except Exception:
        return 1 << 60


def similarity_pairs(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 6,
    method: str = "auto",
    n_blocks: int | None = None,
    broadcast_max_bytes: int = 64 << 20,
) -> DataFrame:
    """All corpus pairs with cosine >= threshold (id_a < id_b). Exact.

    Methods (all exact; pick by data size):

    - ``"auto"`` (default): consult Catalyst's plan statistics for the
      corpus (``optimizedPlan().stats().sizeInBytes`` — no job, no
      collect) and take ``"broadcast"`` when the estimate is under
      ``broadcast_max_bytes`` (64 MB, the same order as
      autoBroadcastJoinThreshold), else ``"block"``. Small corpora skip
      the xB replication shuffle entirely; large ones never touch the
      driver.
    - ``"block"`` (the scale path): triangle-blocked
      distributed all-pairs. Rows hash into B blocks; each of the
      B*(B+1)/2 unordered block pairs becomes one task that BLAS-matmuls
      its two blocks. Shuffle volume is O(n*B) (each row is replicated
      to the B groups it participates in) — the classic all-pairs
      triangle scheme; pick B ~ sqrt(cluster cores) at scale. NOTHING
      is collected to the driver.
    - ``"broadcast"``: collect + broadcast the full normalized corpus
      matrix, matmul each Arrow batch against it. Fastest on small
      corpora (no replication shuffle) but driver-bound: opt-in only,
      sane up to ~1M x small-dim vectors.
    - ``"expr"``: pure JVM expression cross-join — no Python workers at
      all, ~50x slower per pair; for environments where Arrow/pandas
      workers are unavailable.

    Exactness is the contract here (near-threshold-dense corpora make
    "LSH with recall 1" impossible — the fixture has ~1/3 of its
    >=0.35 pairs within 0.01 of the threshold). For approximate
    similarity at scale use :func:`lsh_topk` / :func:`ivf_topk`, which
    trade recall explicitly.
    """
    if method == "auto":
        method = (
            "broadcast"
            if _plan_size_bytes(corpus) <= broadcast_max_bytes
            else "block"
        )
    if method == "block":
        return _pairs_blocked(
            corpus, threshold, id_col, vec_col, round_digits, n_blocks
        )
    if method == "broadcast":
        return _pairs_numpy(corpus, threshold, id_col, vec_col, round_digits)
    if method != "expr":
        raise ValueError(f"unknown method {method!r}")
    a = corpus.select(F.col(id_col).alias("id_a"), l2_normalize(vec_col).alias("__va"))
    b = corpus.select(F.col(id_col).alias("id_b"), l2_normalize(vec_col).alias("__vb"))
    sim = dot(F.col("__va"), F.col("__vb"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine_sim", sim)
        .filter(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
    )


def _pairs_blocked(
    corpus: DataFrame,
    threshold: float,
    id_col: str,
    vec_col: str,
    round_digits: int | None,
    n_blocks: int | None = None,
) -> DataFrame:
    """Distributed exact all-pairs: triangle block replication.

    Row r (block b = pmod(xxhash64(id), B)) is sent to the B groups
    {(min(b,g), max(b,g)) : g in 0..B-1}; group (i, j) holds exactly
    the rows of blocks i and j, so every unordered row pair lands in
    exactly one group — (i, j) = the sorted block pair of its rows —
    and same-block pairs only in (b, b). One explode (xB) + one
    shuffle on the group key; each group is a dense matmul.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    spark = corpus.sparkSession
    # default B: small enough that group-scheduling overhead doesn't
    # dominate (B*(B+1)/2 tasks, xB replication), large enough to
    # spread the quadratic work; measured sweet spot at local[32] on
    # the fixture. At real scale pass n_blocks ~ sqrt(2 x cores) so
    # every core gets ~one block pair.
    B = n_blocks or max(2, min(8, spark.sparkContext.defaultParallelism))
    id_type = corpus.schema[id_col].dataType

    base = corpus.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(B))
        .cast("int")
        .alias("__blk"),
    )
    grouped = base.select(
        "__id",
        "__v",
        "__blk",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(B - 1)),
                lambda g: F.struct(
                    F.least(F.col("__blk"), g).alias("gi"),
                    F.greatest(F.col("__blk"), g).alias("gj"),
                ),
            )
        ).alias("__g"),
    ).select("__id", "__v", "__blk", F.col("__g.gi").alias("__gi"), F.col("__g.gj").alias("__gj"))

    out_schema = T.StructType(
        [
            T.StructField("id_a", id_type),
            T.StructField("id_b", id_type),
            T.StructField("cosine_sim", T.DoubleType()),
        ]
    )

    def _norm_mat(pdf: pd.DataFrame) -> "np.ndarray":
        mat = np.stack(pdf["__v"].to_numpy()).astype("float64")
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        return mat / norms

    # Tile the per-group matmul: a full group-sims matrix at block size
    # m is m^2 doubles (10k rows -> 800 MB, x3 with round+mask copies,
    # x32 concurrent tasks -> memory-bandwidth collapse, measured ~2x
    # at n=80k). A 2048-row slab bounds every allocation to
    # 2048 x m, keeping all tasks inside cache-friendly working sets.
    _SLAB = 2048

    def _slab_pairs(ids_a, mat_a, ids_b, mat_b, same_block):
        cols_a, cols_b, cols_s = [], [], []
        for s in range(0, len(ids_a), _SLAB):
            sims = mat_a[s:s + _SLAB] @ mat_b.T
            if round_digits is not None:
                np.round(sims, round_digits, out=sims)
            mask = sims >= threshold
            if same_block:
                # strict upper triangle by id: each pair once
                mask &= ids_a[s:s + _SLAB, None] < ids_b[None, :]
            ri, cj = np.nonzero(mask)
            if len(ri) == 0:
                continue
            cols_a.append(ids_a[s + ri])
            cols_b.append(ids_b[cj])
            cols_s.append(sims[ri, cj])
        if not cols_a:
            return None
        return (
            np.concatenate(cols_a),
            np.concatenate(cols_b),
            np.concatenate(cols_s),
        )

    def score(key, pdf: pd.DataFrame) -> pd.DataFrame:
        i, j = key
        empty = pd.DataFrame({"id_a": [], "id_b": [], "cosine_sim": []})
        if len(pdf) == 0:
            return empty
        if i == j:
            ids = pdf["__id"].to_numpy()
            mat = _norm_mat(pdf)
            out = _slab_pairs(ids, mat, ids, mat, same_block=True)
            if out is None:
                return empty
            return pd.DataFrame(
                {"id_a": out[0], "id_b": out[1], "cosine_sim": out[2]}
            )
        pa, pb = pdf[pdf["__blk"] == i], pdf[pdf["__blk"] == j]
        if len(pa) == 0 or len(pb) == 0:
            return empty
        ids_a, ids_b = pa["__id"].to_numpy(), pb["__id"].to_numpy()
        out = _slab_pairs(
            ids_a, _norm_mat(pa), ids_b, _norm_mat(pb), same_block=False
        )
        if out is None:
            return empty
        lo = np.minimum(out[0], out[1])
        hi = np.maximum(out[0], out[1])
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cosine_sim": out[2]})

    return grouped.groupBy("__gi", "__gj").applyInPandas(score, out_schema)


def _pairs_numpy(
    corpus: DataFrame,
    threshold: float,
    id_col: str,
    vec_col: str,
    round_digits: int | None,
) -> DataFrame:
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    spark = corpus.sparkSession
    all_ids, all_mat = _collect_query_matrix(corpus, id_col, vec_col)
    bc = _rotate_broadcast(
        spark.sparkContext, "_pairs_numpy", (all_ids, all_mat)
    )
    id_type = corpus.schema[id_col].dataType
    schema = T.StructType(
        [
            T.StructField("id_a", id_type),
            T.StructField("id_b", id_type),
            T.StructField("cosine_sim", T.DoubleType()),
        ]
    )

    def score(batches):
        ids_full, mat_full = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            mat = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            sims = (mat / norms) @ mat_full.T  # (batch, n_corpus)
            if round_digits is not None:
                sims = np.round(sims, round_digits)
            # id_a < id_b keeps each unordered pair exactly once
            rows_i, cols_j = np.nonzero(
                (sims >= threshold) & (ids[:, None] < ids_full[None, :])
            )
            yield pd.DataFrame(
                {
                    "id_a": ids[rows_i],
                    "id_b": ids_full[cols_j],
                    "cosine_sim": sims[rows_i, cols_j],
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(score, schema)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 64,
    n_probe: int = 8,
    kmeans_iters: int = 5,
    train_sample: int = 4096,
    seed: int = 42,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "vec_id",
    query_vec: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k via an IVF (inverted-file) index.

    The other classic ANN scale path next to SRP-LSH (lsh_topk):

    1. train: k-means centroids on a bounded sample (driver-side numpy,
       deterministic seed — centroids are tiny and ship in closures);
    2. assign: each corpus vector goes to its nearest centroid — one
       mapInPandas pass, partitioned by centroid (the 'inverted lists');
    3. probe: each query searches only its ``n_probe`` nearest
       centroids' lists — the corpus fraction scanned is ~n_probe/
       n_centroids, the recall/cost dial;
    4. exact cosine re-rank of probed candidates, deterministic ties.

    Returns <=k rows per query (approximate; rows-only correctness).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    # --- 1. train centroids on a sample (spherical k-means) ---------
    # limit() instead of count()+sample(): sizing the fraction cost a
    # full corpus scan just to train on <=train_sample rows. limit
    # short-circuits the scan (CollectLimitExec reads only the splits
    # it needs) and is deterministic for a fixed source.
    sample = corpus.select(corpus_vec).limit(train_sample).collect()
    mat = np.array([list(r[0]) for r in sample], dtype="float64")
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mat = mat / norms
    rng = np.random.default_rng(seed)
    n_c = min(n_centroids, len(mat))
    cents = mat[rng.choice(len(mat), size=n_c, replace=False)]
    for _ in range(kmeans_iters):
        assign = (mat @ cents.T).argmax(axis=1)
        for c in range(n_c):
            members = mat[assign == c]
            if len(members):
                v = members.sum(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    cents[c] = v / nv
    qids, qmat = _collect_query_matrix(queries, query_id, query_vec)

    # --- 2./3. assign corpus to lists, probe lists per query --------
    probe = {}  # centroid -> query row indices probing it
    qprobe = np.argsort(-(qmat @ cents.T), axis=1)[:, :n_probe]
    for qi, cs in enumerate(qprobe):
        for c in cs:
            probe.setdefault(int(c), []).append(qi)

    schema = T.StructType(
        [
            T.StructField("query_id", queries.schema[query_id].dataType),
            T.StructField("match_id", corpus.schema[corpus_id].dataType),
            T.StructField("cosine_sim", T.DoubleType()),
        ]
    )
    kk = k

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[corpus_id].to_numpy()
            m = np.stack(pdf[corpus_vec].to_numpy()).astype("float64")
            nr = np.linalg.norm(m, axis=1, keepdims=True)
            nr[nr == 0] = 1.0
            m = m / nr
            cass = (m @ cents.T).argmax(axis=1)  # corpus list assignment
            out_q, out_m, out_s = [], [], []
            for c in np.unique(cass):
                qidx = probe.get(int(c))
                if not qidx:
                    continue
                rows = np.nonzero(cass == c)[0]
                sims = np.round(m[rows] @ qmat[qidx].T, 6)  # (rows, probes)
                for j, qi in enumerate(qidx):
                    col = sims[:, j]
                    mask = ids[rows] != qids[qi]
                    cand = np.nonzero(mask)[0]
                    if len(cand) == 0:
                        continue
                    order = np.lexsort((ids[rows][cand], -col[cand]))[:kk]
                    sel = cand[order]
                    out_q.extend([qids[qi]] * len(sel))
                    out_m.extend(ids[rows][sel].tolist())
                    out_s.extend(col[sel].tolist())
            yield pd.DataFrame(
                {"query_id": out_q, "match_id": out_m, "cosine_sim": out_s}
            )

    scored = corpus.select(corpus_id, corpus_vec).mapInPandas(score, schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("match_id").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= kk)
        .select("query_id", "match_id", "cosine_sim")
    )


def srp_planes(
    dim: int, n_planes: int, n_tables: int, seed: int
) -> list[list[list[float]]]:
    """Deterministic hyperplane family ``[table][plane][dim]``.

    Component (t, p, d) = the first 32 bits of
    ``sha256(f"{seed}:{t}:{p}:{d}")`` recentred to [-1, 1). sha256 is
    available and byte-identical in every engine (the same trick the
    multimodal stub kernel uses), so an external oracle can regenerate
    the exact planes in SQL — and the scaling is a power-of-two
    division of a 32-bit integer, which is exact in float64 on both
    sides. Computed once driver-side (n_tables * n_planes * dim
    hashes, microseconds) and shipped to executors as a plan literal —
    no RNG state, no broadcast variable.
    """
    import hashlib

    return [
        [
            [
                (
                    int(
                        hashlib.sha256(
                            f"{seed}:{t}:{p}:{d}".encode()
                        ).hexdigest()[:8],
                        16,
                    )
                    - 2**31
                )
                / 2**31
                for d in range(dim)
            ]
            for p in range(n_planes)
        ]
        for t in range(n_tables)
    ]


def _srp_signature(vec_col: str, dim: int, n_planes: int, planes_lit, table):
    """Sign-bit signature under the ``srp_planes`` hyperplane family.

    ``planes_lit`` is the nested-array literal from ``srp_planes``;
    ``table`` is a (possibly lambda-bound) 0-based table index column.
    bit_p = (v . plane_p) >= 0, with the dot product accumulated
    left-to-right in element order so the oracle's sequential fold
    reproduces the sum bit-for-bit.

    A vector whose length differs from ``dim`` raises per-row instead
    of silently zip-padding nulls (null sign bits would quietly degrade
    buckets, in the worst case collapsing everything into one bucket —
    a hidden quadratic re-rank).
    """
    vec = F.col(vec_col)
    dim_guard = F.when(F.size(vec) == dim, F.lit(0.0)).otherwise(
        F.raise_error(
            F.concat(
                F.lit("srp_signature: embedding length "),
                F.size(vec).cast("string"),
                F.lit(f" != dim {dim}"),
            )
        ).cast("double")
    )
    tbl_planes = F.element_at(planes_lit, table.cast("int") + 1)
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_planes - 1)),
        lambda p: (
            F.aggregate(
                F.zip_with(
                    vec,
                    F.element_at(tbl_planes, p + 1),
                    lambda x, c: x.cast("double") * c,
                ),
                dim_guard,
                lambda acc, x: acc + x,
            )
            >= 0
        ).cast("int"),
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_planes: int = 16,
    n_tables: int = 4,
    seed: int = 42,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "vec_id",
    query_vec: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k via multi-table SRP-LSH.

    Each table hashes vectors to a bucket (the packed sign bits of
    ``n_planes`` hyperplanes); query/corpus pairs colliding in any
    table are re-ranked with exact cosine. Recall grows with
    ``n_tables``; cost is n_tables bucket shuffles of the corpus vs a
    full scan per query for brute force. Returns <=k rows per query.

    The result is approximate in recall terms but fully deterministic:
    the ``srp_planes`` family is sha256-derived and the bucket id is
    the big-endian fold of the sign bits, so an external SQL oracle
    can replay the entire pipeline (planes -> bits -> buckets ->
    collision join -> exact re-rank) and hash-match the output.
    """
    planes_lit = F.lit(srp_planes(dim, n_planes, n_tables, seed))

    def with_buckets(df: DataFrame, idc: str, vecc: str, out_id: str, out_vec: str):
        return df.select(
            F.col(idc).alias(out_id),
            F.col(vecc).alias(out_vec),
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(n_tables - 1)),
                    lambda t: F.struct(
                        t.alias("table_id"),
                        F.aggregate(
                            _srp_signature(vecc, dim, n_planes, planes_lit, t),
                            F.lit(0).cast("long"),
                            lambda acc, b: acc * 2 + b,
                        ).alias("bucket"),
                    ),
                )
            ).alias("tb"),
        ).select(out_id, out_vec, "tb.table_id", "tb.bucket")

    qb = with_buckets(queries, query_id, query_vec, "query_id", "__qv")
    cb = with_buckets(corpus, corpus_id, corpus_vec, "match_id", "__cv")
    # Score INSIDE the bucket-join stage, before deduplicating pairs
    # that collide in several tables: cosine is deterministic per
    # (query, match), so distinct over (ids, score) equals distinct
    # over ids — and both the dedup shuffle and the rank-window shuffle
    # then move (id, id, double) rows instead of embedding arrays.
    # Costs up to n_tables re-scores per duplicated collision; at scale
    # recompute is cheaper than shuffling vectors.
    scored = (
        qb.join(cb, on=["table_id", "bucket"], how="inner")
        .filter(F.col("query_id") != F.col("match_id"))
        .select(
            "query_id",
            "match_id",
            F.round(cosine(F.col("__qv"), F.col("__cv")), 6).alias(
                "cosine_sim"
            ),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("match_id").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("query_id", "match_id", "cosine_sim")
    )


def ivf_topk_hash(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 32,
    n_probe: int = 8,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "vec_id",
    query_vec: str = "embedding",
) -> DataFrame:
    """IVF top-k with deterministic hash-sampled centroids.

    The ``ivf_topk`` variant whose every step is engine-reproducible
    (and therefore carries an exact SQL oracle, like lsh_topk):

    1. centroids = the ``n_centroids`` corpus vectors with the smallest
       ``(md5(id), id)`` key — a uniform deterministic sample needing
       one distributed top-K scan (TakeOrderedAndProject), no k-means
       training pass. FAISS-style random-subsample centroid init, made
       hash-deterministic.
    2. assign: each corpus vector -> its best centroid by cosine
       rounded to 6 (ties -> lowest centroid index; np.argmax takes
       the FIRST max, which is exactly the oracle's ``ORDER BY sim
       DESC, cidx ASC``). One vectorized Arrow pass — a (batch x dim)
       @ (dim x n_centroids) matmul per batch, the same numpy-vs-SQL
       rounding discipline embedding_topk's hash-matching established.
    3. probe: each query takes its ``n_probe`` best centroids by the
       same rounded-cosine rule (query set is bounded by contract and
       evaluated driver-side, like brute_force_topk's query matrix).
    4. candidates = corpus rows whose centroid is probed (broadcast
       semi-filter on centroid index), re-ranked with exact cosine.

    Scale: the corpus is scanned twice (top-K + assign) and never
    shuffled before the candidate set; centroid vectors ride in the
    UDF closure (n_centroids * dim doubles).
    """
    assigned, centroids = build_ivf_hash_index(
        corpus, n_centroids, corpus_id, corpus_vec
    )
    return ivf_topk_from_index(
        assigned, centroids, queries, k, n_probe,
        corpus_id, corpus_vec, query_id, query_vec,
    )


def build_ivf_hash_index(
    corpus: DataFrame,
    n_centroids: int | None = None,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """The build half of :func:`ivf_topk_hash`, split out so the index
    PERSISTS across query batches (e.g. via plans/versioned): returns

    - ``assigned``  — (id, vec, cidx): every corpus vector tagged with
      its best hash-sampled centroid (one Arrow matmul pass), and
    - ``centroids`` — (cidx, centroid array<double>): the tiny
      centroid table.

    Write both once; every later :func:`ivf_topk_from_index` call
    probes WITHOUT re-scanning or re-assigning the corpus — the
    embedding analog of the MinHash signature index
    (dedup.build_minhash_index).

    ``n_centroids=None`` (default) picks ~sqrt(n) cells (one count
    job, amortized over a persisted build). Cell GEOMETRY is the
    probe's real cost dial, not just a recall knob: at 320k vectors a
    deliberately coarse 64-cell index probed 8/64 ran only 1.25x
    under the exact scan — per-cell bookkeeping (query-matrix
    fancy-index copies) ate the 8x FLOP saving because each cell held
    ~4k vectors (SCALE_NOTES round 6). sqrt(n) cells keep the probed
    fraction, not the copy overhead, as the dominant term; callers
    pinning ``n_centroids`` explicitly own that trade.
    """
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    if n_centroids is None:
        n_centroids = max(1, math.isqrt(corpus.count()))
    cent_rows = (
        corpus.select(F.col(corpus_id).alias("cid"), F.col(corpus_vec).alias("cv"))
        .orderBy(F.md5(F.col("cid").cast("string")), F.col("cid"))
        .limit(n_centroids)
        .collect()
    )
    if not cent_rows:
        raise ValueError(
            "cannot build an IVF index over an empty corpus "
            "(no vectors to sample centroids from)"
        )
    cmat = np.array([list(r["cv"]) for r in cent_rows], dtype="float64")
    cn = np.linalg.norm(cmat, axis=1, keepdims=True)
    cn[cn == 0] = 1.0
    cmat_n = cmat / cn
    spark = corpus.sparkSession
    # one-slice local frame: k rows need one slice, not
    # defaultParallelism (plans/localframe.py)
    from fugue_warehouses_spark.plans.localframe import local_frame

    centroids = local_frame(
        spark,
        [(int(i), [float(x) for x in cmat[i]]) for i in range(len(cmat))],
        "cidx int, centroid array<double>",
    )

    assigned = _assign_to_centroids(corpus, cmat_n, corpus_id, corpus_vec)
    return assigned, centroids


def _assign_to_centroids(
    df: DataFrame, centroids, id_col: str, vec_col: str
) -> DataFrame:
    """(id, vec) -> (id, vec, cidx) against a fixed centroid geometry
    (a normalized centroid matrix, a ``(cidx, centroid)`` DataFrame,
    or collected centroid rows), emitted in INVERTED-LIST LAYOUT:
    clustered by cell before it is persisted/checkpointed. In corpus
    order every downstream Arrow batch holds rows of ~ALL cells, so a
    cell-grouped probe (_ivf_threshold_hits) pays its per-cell
    bookkeeping (query-list fancy-index copy) n_cells times per batch
    — the round-6/7 probe's dominant cost. Clustered, a batch spans
    O(1) cells, the per-cell copy amortizes over the whole cell, and
    a parquet-persisted index gets row-group pruning for cell
    filters. One shuffle, amortized over every probe. Shared by
    :func:`build_ivf_hash_index` (build-time) and the rolling-IVF
    streaming ingest (per-delta assignment against the STORED
    geometry)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    if isinstance(centroids, DataFrame):
        centroids = centroids.collect()
    if isinstance(centroids, list):
        rows = sorted(centroids, key=lambda r: r["cidx"])
        cmat = np.array([list(r["centroid"]) for r in rows], dtype="float64")
        cn = np.linalg.norm(cmat, axis=1, keepdims=True)
        cn[cn == 0] = 1.0
        cmat_n = cmat / cn
    else:
        cmat_n = centroids  # already the normalized matrix

    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField(vec_col, df.schema[vec_col].dataType),
            T.StructField("cidx", T.IntegerType()),
        ]
    )

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            nr = np.linalg.norm(m, axis=1, keepdims=True)
            nr[nr == 0] = 1.0
            sims = np.round((m / nr) @ cmat_n.T, 6)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    vec_col: pdf[vec_col],
                    "cidx": sims.argmax(axis=1).astype("int32"),
                }
            )

    return (
        df.select(id_col, vec_col)
        .mapInPandas(assign, out_schema)
        .repartition("cidx")
        .sortWithinPartitions("cidx")
    )


def ivf_topk_from_index(
    assigned: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 8,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "vec_id",
    query_vec: str = "embedding",
    centroid_rows: list | None = None,
    sim_floor: float | None = None,
) -> DataFrame:
    """The probe half of :func:`ivf_topk_hash` over a (possibly
    persisted) index from :func:`build_ivf_hash_index`: rank centroids
    per query (rounded cosine, driver-side over the tiny centroid
    table), broadcast the (cidx, query) probe pairs into the
    assignment table, and exact-rerank only the probed cells'
    vectors. The corpus-sized index is touched by one broadcast-join
    scan; nothing re-assigns.

    ``centroid_rows`` — optional pre-collected rows of ``centroids``
    (driver-side cache of the tiny index metadata). A repeated-probe
    serving loop passes the same list every call and skips the
    per-call collect, which otherwise costs a whole scheduling floor
    even for 32 rows."""
    import numpy as np
    from pyspark.sql import types as T

    # collect unsorted and sort driver-side: .orderBy().collect() on a
    # tiny table still pays a range-partitioning exchange (sampling job
    # + sort job); a plain collect of a local/tiny relation does not
    cent_rows = sorted(
        centroids.collect() if centroid_rows is None else centroid_rows,
        key=lambda r: r["cidx"],
    )
    if not cent_rows:
        raise ValueError("empty centroid table (bad or empty index version?)")
    if [r["cidx"] for r in cent_rows] != list(range(len(cent_rows))):
        raise ValueError("centroid table must have contiguous cidx from 0")
    cmat = np.array([list(r["centroid"]) for r in cent_rows], dtype="float64")
    cn = np.linalg.norm(cmat, axis=1, keepdims=True)
    cn[cn == 0] = 1.0
    cmat_n = cmat / cn

    qrows = queries.select(query_id, query_vec).collect()
    # dedupe repeated query ids driver-side: without the old row-level
    # distinct, a duplicated query row would otherwise emit duplicated
    # probe rows and the duplicates would consume row_number top-k
    # slots. Exact duplicate rows collapse silently; the SAME id
    # carrying a DIFFERENT vector is a contract violation (which
    # vector defines the query?) and raises instead of silently
    # scoring an arbitrary one of the two.
    seen_q: dict = {}
    deduped = []
    for r in qrows:
        vec = tuple(r[1]) if r[1] is not None else None
        if r[0] not in seen_q:
            seen_q[r[0]] = vec
            deduped.append(r)
        elif seen_q[r[0]] != vec:
            raise ValueError(
                f"query id {r[0]!r} appears with two different vectors; "
                "query ids must identify one vector each (dedupe or "
                "re-key the query set)"
            )
    qrows = deduped
    if len(qrows) == 0:
        # mirror _topk_scaffold: an empty query set yields an empty,
        # correctly-typed result, not a (0,0)-matmul shape error
        return assigned.sparkSession.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField(
                        "query_id", queries.schema[query_id].dataType
                    ),
                    T.StructField(
                        "match_id", assigned.schema[corpus_id].dataType
                    ),
                    T.StructField("cosine_sim", T.DoubleType()),
                ]
            ),
        )
    qmat = np.array([list(r[1]) for r in qrows], dtype="float64")
    qn = np.linalg.norm(qmat, axis=1, keepdims=True)
    qn[qn == 0] = 1.0
    qsims = np.round((qmat / qn) @ cmat_n.T, 6)  # (n_q, n_c)
    # The probe rows carry the RAW query vector (original element type,
    # exact round-trip through createDataFrame), so the single probe
    # broadcast is also the query-vector side of the rerank join — one
    # broadcast build, no second scan of the queries relation per call.
    probe_rows = []
    for j, r in enumerate(qrows):
        order = np.lexsort((np.arange(qsims.shape[1]), -qsims[j]))[:n_probe]
        probe_rows.extend((int(c), r[0], r[1]) for c in order)
    spark = assigned.sparkSession
    # plain-tuple createDataFrame: the probe set is tiny (n_q * n_probe
    # rows) and the pandas->Arrow conversion path costs more than it
    # saves at that size
    from fugue_warehouses_spark.plans.localframe import local_frame

    probes = local_frame(  # tiny probe set — one slice
        spark,
        probe_rows,
        schema=T.StructType(
            [
                T.StructField("cidx", T.IntegerType()),
                T.StructField("query_id", queries.schema[query_id].dataType),
                T.StructField("__qv", queries.schema[query_vec].dataType),
            ]
        ),
    )

    cb = assigned.select(
        F.col(corpus_id).alias("match_id"),
        F.col(corpus_vec).alias("__cv"),
        "cidx",
    )
    # No distinct needed: every corpus row carries exactly one cidx and
    # the probe set holds distinct (cidx, query) pairs, so a
    # (query, match) candidate can appear at most once. Score, then
    # project the vectors away BEFORE the rank window so the top-k
    # shuffle moves (id, id, double) rows, not embedding arrays.
    cand = cb.join(F.broadcast(probes), on="cidx").filter(
        F.col("query_id") != F.col("match_id")
    )
    scored = cand.select(
        "query_id",
        "match_id",
        F.round(cosine(F.col("__qv"), F.col("__cv")), 6).alias("cosine_sim"),
    )
    # sim_floor: filter BEFORE the rank window, so threshold-style
    # consumers (incremental_embedding_dedup) rank only the hits —
    # the candidate join still scores every probed-cell pair (that is
    # the IVF cost model), but the top-k shuffle moves hit rows, not
    # the full candidate set
    if sim_floor is not None:
        scored = scored.filter(F.col("cosine_sim") >= sim_floor)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("match_id").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("query_id", "match_id", "cosine_sim")
    )


def decontaminate_semantic(
    corpus: DataFrame,
    benchmark: DataFrame,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    extra_cols: tuple[str, ...] = (),
    threshold: float = 0.35,
    round_digits: int = 6,
) -> DataFrame:
    """SEMANTIC decontamination: flag corpus rows whose embedding is
    within ``cosine >= threshold`` of ANY benchmark vector — the
    embedding-space sibling of the n-gram `contamination` /
    `decontaminate_spans` family (paraphrased benchmark leakage that
    lexical n-grams miss). Output: one row per CONTAMINATED corpus
    row — ``(corpus_id, *extra_cols, nearest_benchmark, max_sim)``,
    ``nearest_benchmark`` the argmax benchmark id with ties (at
    ``round_digits`` rounding) broken toward the smallest id; callers
    anti-join the flags to drop the rows.

    Scale shape: the benchmark set is eval-suite-sized by contract —
    it collects to a normalized float64 matrix shipped in the task
    closure; the corpus STREAMS through one Arrow kernel doing a
    single (batch x dim) @ (dim x n_bench) GEMM + row-max — no
    shuffle, no corpus collect, output bounded by contamination count.
    Same rounding-commutes-with-max argument as max_cosine_against.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    bids, bmat = _collect_query_matrix(benchmark, corpus_id, corpus_vec)
    if len(bids) == 0:
        raise ValueError("benchmark set is empty")
    order = np.argsort(bids)  # argmax first-match => min benchmark id
    bids_sorted = bids[order]
    bmat_sorted = bmat[order]

    fields = [T.StructField(corpus_id, corpus.schema[corpus_id].dataType)]
    fields += [
        T.StructField(c, corpus.schema[c].dataType) for c in extra_cols
    ]
    fields += [
        # benchmark ids fill this column — type from the BENCHMARK
        # frame (a different table by design; its ids may be strings
        # while corpus ids are longs)
        T.StructField(
            "nearest_benchmark", benchmark.schema[corpus_id].dataType
        ),
        T.StructField("max_sim", T.DoubleType()),
    ]
    schema = T.StructType(fields)
    cols = [corpus_id, *extra_cols, corpus_vec]

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array(pdf[corpus_vec].tolist(), dtype="float64")
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            sims = np.round((mat / norms) @ bmat_sorted.T, round_digits)
            mx = sims.max(axis=1)
            keep = mx >= threshold
            if not keep.any():
                continue
            am = sims[keep].argmax(axis=1)
            out = {corpus_id: pdf[corpus_id].to_numpy()[keep]}
            for c in extra_cols:
                out[c] = pdf[c].to_numpy()[keep]
            out["nearest_benchmark"] = bids_sorted[am]
            out["max_sim"] = mx[keep]
            yield pd.DataFrame(out)

    return corpus.select(*cols).mapInPandas(run, schema)


def recall_at_k(
    truth: DataFrame,
    approx: DataFrame,
    query_id: str = "query_id",
    match_id: str = "match_id",
) -> float:
    """Mean per-query recall of an approximate top-k result against an
    exact one: |approx ∩ truth| / |truth|, averaged over the queries
    present in ``truth``. Both frames use the (query_id, match_id)
    result contract every top-k operator here emits
    (:func:`brute_force_topk`, :func:`lsh_topk`,
    :func:`ivf_topk_from_index`, ...).

    This is the quality axis a serving deployment tunes against
    (round 11, VERDICT r10 next #5): answer-identity at full probe is
    pinned by tests, but choosing ``n_probe`` / ``n_tables`` for a
    100 TB index means trading this number against probe cost — the
    recall curve lives in SCALE_NOTES (`scale_probe.py --ops
    ann_recall`). Queries absent from ``approx`` count as recall 0 for
    their truth rows (an ANN that drops a query entirely must not
    improve the average). One semi-join + two grouped counts,
    truth-sized; no collect beyond the final scalar.
    """
    t = truth.groupBy(F.col(query_id).alias("__q")).agg(
        F.count("*").alias("__n_true")
    )
    h = (
        truth.join(approx, [query_id, match_id], "leftsemi")
        .groupBy(F.col(query_id).alias("__q"))
        .agg(F.count("*").alias("__n_hit"))
    )
    per = t.join(h, "__q", "left").select(
        (
            F.coalesce(F.col("__n_hit"), F.lit(0))
            / F.col("__n_true")
        ).alias("__r")
    )
    row = per.agg(F.avg("__r").alias("recall")).first()
    return float(row["recall"]) if row["recall"] is not None else 0.0


# ---------------- hard-negative mining ----------------------------


def hard_negative_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    round_digits: int | None = 6,
) -> DataFrame:
    """Contrastive-training hard negatives: for each query vector, the
    ``k`` most cosine-similar corpus vectors whose ``label_col``
    DIFFERS from the query's — the highest-loss negatives for a
    contrastive/triplet objective (same top-k machinery as
    :func:`brute_force_topk`, plus the label mask applied BEFORE
    ranking, so easy same-class neighbors never crowd out the
    negatives).

    Output: (query_id, match_id, match_label, cosine_sim), ties broken
    by match_id ascending after 6-dp rounding (cross-engine stable).

    Scale shape: the query/anchor set is collected as a normalized
    float64 matrix (bounded by contract — mine negatives for a batch
    of anchors per call); the corpus streams through one Arrow-batched
    BLAS matmul per batch with NO shuffle before the k·|queries|
    candidate set. For corpus-wide mining at 100 TB, feed anchors in
    batches or generate candidates with :func:`ivf_topk_hash` /
    :func:`lsh_topk` first and apply the label mask on the candidate
    set.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    rows = queries.select(id_col, vec_col, label_col).collect()
    qids = np.asarray([r[0] for r in rows])
    qlabels = [r[2] for r in rows]
    if len(rows) == 0:
        qmat = np.zeros((0, 0), dtype="float64")
    else:
        qmat = np.array([list(r[1]) for r in rows], dtype="float64")
        norms = np.linalg.norm(qmat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        qmat = qmat / norms

    schema = T.StructType(
        [
            T.StructField("query_id", queries.schema[id_col].dataType),
            T.StructField("match_id", corpus.schema[id_col].dataType),
            T.StructField("match_label", corpus.schema[label_col].dataType),
            T.StructField("cosine_sim", T.DoubleType()),
        ]
    )

    def compute(pdf):
        ids = pdf[id_col].to_numpy()
        labels = pdf[label_col].to_numpy()
        mat = np.stack(pdf[vec_col].to_numpy()).astype("float64")
        cn = np.linalg.norm(mat, axis=1, keepdims=True)
        cn[cn == 0] = 1.0
        return ids, (mat / cn) @ qmat.T, {"match_label": labels}

    def mask(j, ids, extras):
        # SQL `q.label <> c.label` semantics: NULL/NaN on EITHER side
        # excludes the pair (a missing label is not a known-different
        # label, so it must not be mined as a negative)
        labels = extras["match_label"]
        ql = qlabels[j]
        if pd.isna(ql):
            return np.zeros(len(ids), dtype=bool)
        valid = ~pd.isna(labels)
        differs = np.zeros(len(ids), dtype=bool)
        differs[valid] = labels[valid] != ql
        return (ids != qids[j]) & differs

    return _topk_scaffold(
        corpus,
        [id_col, vec_col, label_col],
        schema,
        "cosine_sim",
        qids,
        k,
        round_digits,
        compute,
        mask,
        extra_fields=("match_label",),
    )


# ---------------- incremental embedding dedup ----------------------


def max_cosine_against(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_vec: str = "embedding",
    query_id: str = "vec_id",
    query_vec: str = "embedding",
    round_digits: int | None = 6,
    _qmatrix: tuple | None = None,
) -> DataFrame:
    """Per-query MAX cosine against a streaming corpus:
    (query_id, max_sim), one row per query.

    This is the all-queries-at-once primitive the batch-dedup path
    needs, and it deliberately bypasses :func:`brute_force_topk`: the
    top-k scaffold runs a per-query Python loop (mask + lexsort) per
    Arrow batch — right for a bounded serving query set, quadratic
    agony for a 16k-row dedup batch (measured 117-334 s at 80k docs,
    round 6; this shape re-measures in seconds). Here each corpus
    batch does ONE matmul + ONE ``sims.max(axis=0)`` and emits one
    narrow row per query; a single groupBy-max merges batches. No id
    masking — callers guarantee disjoint id sets (dedup batches are
    new rows by construction). Rounding commutes with max, so
    rounding the merged max equals maxing rounded sims.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    # _qmatrix: a caller that already collected the (ids, normalized
    # matrix) pair — e.g. incremental_embedding_dedup, which reuses it
    # for the within-batch resolution — passes it through to avoid a
    # second collect job
    qids, qmat = (
        _collect_query_matrix(queries, query_id, query_vec)
        if _qmatrix is None
        else _qmatrix
    )
    schema = T.StructType(
        [
            T.StructField("query_id", queries.schema[query_id].dataType),
            T.StructField("max_sim", T.DoubleType()),
        ]
    )
    if len(qids) == 0:
        return corpus.sparkSession.createDataFrame([], schema)

    # TILE the max-reduce GEMM so the sims tile stays CACHE-resident,
    # not merely bounded: this kernel's arithmetic intensity is low
    # (dim madds per sims element), so the wall is sims-buffer memory
    # traffic, not FLOPs. 2048x2048 tiles (33 MB) spill every tile to
    # RAM and read it back for the max — measured 11.7 s of matmul per
    # task at the 320k probe; 512x256 tiles (1 MB, reused by the
    # allocator, consumed immediately by the max) re-measure at 2.3 s
    # for identical FLOPs (round 7, 5 shapes probed). Query-major loop
    # order keeps each 256-query slab of qmat (a contiguous .copy())
    # cached across the whole row loop. Tiling never splits the
    # reduction dim, so sims values are bit-identical.
    _RSLAB, _QSLAB = 512, 256
    # spark broadcast, NOT closure capture: a closure-captured query
    # matrix is re-unpickled by every TASK (32 tasks x 33 MB at the
    # 320k probe); a broadcast is materialized once per worker process
    # and cached across tasks (same choice as _pairs_numpy); rotated —
    # one live broadcast per site, prior micro-batches' released
    bc = _rotate_broadcast(
        corpus.sparkSession.sparkContext, "max_cosine_against", (qids, qmat)
    )

    def score(batches):
        b_qids, b_qmat = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf[corpus_vec].to_numpy()).astype("float64")
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            mat = mat / norms
            best = np.full(len(b_qids), -np.inf)
            for q0 in range(0, len(b_qids), _QSLAB):
                qt = b_qmat[q0 : q0 + _QSLAB].T.copy()
                b = best[q0 : q0 + _QSLAB]
                for r0 in range(0, mat.shape[0], _RSLAB):
                    np.maximum(
                        b,
                        (mat[r0 : r0 + _RSLAB] @ qt).max(axis=0),
                        out=b,
                    )
            yield pd.DataFrame({"query_id": b_qids, "max_sim": best})

    merged = (
        corpus.select(corpus_vec)
        .mapInPandas(score, schema)
        .groupBy("query_id")
        .agg(F.max("max_sim").alias("max_sim"))
    )
    if round_digits is not None:
        merged = merged.withColumn(
            "max_sim", F.round(F.col("max_sim"), round_digits)
        )
    return merged


def _ivf_threshold_hits(
    assigned: DataFrame,
    queries: DataFrame,
    threshold: float,
    n_probe: int,
    centroids: DataFrame | None,
    centroid_rows: list | None,
    corpus_vec: str,
    query_id: str,
    query_vec: str,
    round_digits: int | None,
    _qmatrix: tuple | None = None,
) -> DataFrame:
    """Distinct query ids whose cosine against ANY vector in their
    probed IVF cells reaches ``threshold`` — the existence question
    behind index-served batch dedup.

    Deliberately NOT :func:`ivf_topk_from_index`: that plan joins the
    probe set into the assignment table and scores candidates with
    the JVM expression cosine — right for a small serving query set,
    but a 16k-query dedup batch probing 1/8 of a 64k index makes
    ~128M candidate rows of per-pair interpreted array math (the
    round-6 probe never finished the leg). Here the query matrix and
    the per-cell query lists ride the closure; each Arrow batch of
    the index groups its rows by cell and runs ONE BLAS matmul per
    (batch, cell) pair against just the queries probing that cell —
    no join, no shuffle before the (tiny) hit set. Closure size is
    bounded by the batch contract (qmat + n_q * n_probe cell slots).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    cent_rows = sorted(
        centroids.collect() if centroid_rows is None else centroid_rows,
        key=lambda r: r["cidx"],
    )
    if not cent_rows:
        raise ValueError("empty centroid table (bad or empty index version?)")
    cmat = np.array([list(r["centroid"]) for r in cent_rows], dtype="float64")
    qids, qmat = (
        _collect_query_matrix(queries, query_id, query_vec)
        if _qmatrix is None
        else _qmatrix
    )
    schema = T.StructType(
        [T.StructField("query_id", queries.schema[query_id].dataType)]
    )
    if len(qids) == 0:
        return assigned.sparkSession.createDataFrame([], schema)
    n_c = cmat.shape[0]
    if n_probe >= n_c:
        # probing every cell: the centroid-sim matmul + argsort picks
        # all of them anyway — skip both (the exact/identity facet's
        # hot path at small sf, where job+driver floor dominates)
        all_q = np.arange(len(qids))
        cell_map = {int(r["cidx"]): all_q for r in cent_rows}
    else:
        cn = np.linalg.norm(cmat, axis=1, keepdims=True)
        cn[cn == 0] = 1.0
        cmat_nt = (cmat / cn).T
        # per-query probed cells, BLOCKED over queries so the
        # sims/rank temporaries stay a few MB and get reused by the
        # allocator (fresh large temps fault at single-digit MB/s on
        # this host class — session._tune_malloc); round+negate run
        # in place, argsort(-round(sims)) per block == the global
        # stable ranking. Replaces a per-(query, probe) Python dict
        # loop (6-22 s at the 320k probe) AND a monolithic 258 MB
        # round/argsort (20-40 s cold) with ~1 s of blocked numpy.
        n_q = len(qids)
        order = np.empty((n_q, n_probe), dtype=np.int64)
        blk = 4096
        for s in range(0, n_q, blk):
            sims = qmat[s : s + blk] @ cmat_nt  # qmat arrives normalized
            np.round(sims, 6, out=sims)
            np.negative(sims, out=sims)
            order[s : s + blk] = np.argsort(
                sims, axis=1, kind="stable"
            )[:, :n_probe]
        cells_flat = order.ravel()
        qi_flat = np.repeat(
            np.arange(order.shape[0], dtype=np.int32), n_probe
        )
        by_cell = np.argsort(cells_flat, kind="stable")
        cells_sorted = cells_flat[by_cell]
        qi_sorted = qi_flat[by_cell]  # int32: halves the broadcast
        uniq, starts = np.unique(cells_sorted, return_index=True)
        bounds = np.append(starts, len(cells_sorted))
        # key by the STORED cidx values, not matrix column positions:
        # cmat is cidx-SORTED cent_rows, so column j is cidx
        # cidx_vals[j] — identical only while cidx is contiguous
        # 0..n_c-1 (always true for build_ivf_hash_index output, but a
        # pruned/filtered centroid table would silently mis-probe;
        # round-8 ADVICE fix, matching the n_probe>=n_c path's keying)
        cidx_vals = [int(r["cidx"]) for r in cent_rows]
        cell_map = {
            cidx_vals[int(uniq[k])]: qi_sorted[bounds[k] : bounds[k + 1]]
            for k in range(len(uniq))
        }

    # broadcast, not closure capture: query matrix + per-cell lists
    # are ~65 MB at the 320k probe and would be re-unpickled per TASK
    # from a closure; a broadcast materializes once per worker;
    # rotated — one live broadcast per site across micro-batches
    bc = _rotate_broadcast(
        assigned.sparkSession.sparkContext,
        "_ivf_threshold_hits",
        (qids, qmat, cell_map),
    )

    def score(batches):
        b_qids, b_qmat, b_cells = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf[corpus_vec].to_numpy()).astype("float64")
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            mat = mat / norms
            cidxs = pdf["cidx"].to_numpy()
            hit: list = []
            for c in np.unique(cidxs):
                qidx = b_cells.get(int(c))
                if qidx is None:
                    continue
                cell = mat[cidxs == c]
                # cache-resident tiles, query-major (see
                # max_cosine_against: the sims tile is the traffic,
                # not the FLOPs)
                for q0 in range(0, len(qidx), 256):
                    qsel = qidx[q0 : q0 + 256]
                    qt = np.ascontiguousarray(b_qmat[qsel].T)
                    best = np.full(len(qsel), -np.inf)
                    for r0 in range(0, cell.shape[0], 512):
                        np.maximum(
                            best,
                            (cell[r0 : r0 + 512] @ qt).max(axis=0),
                            out=best,
                        )
                    # round AFTER the max reduction: round is
                    # monotone, so round(max) >= t ⟺ any round(s) >= t
                    # — identical hits, but the per-element round over
                    # the full sims matrix (~2e9 elements at the 320k
                    # probe, ~20 s of pure np.round) collapses to one
                    # round per (query, cell)
                    if round_digits is not None:
                        best = np.round(best, round_digits)
                    hit.extend(b_qids[qsel[best >= threshold]])
            yield pd.DataFrame({"query_id": hit})

    probe = assigned.select(corpus_vec, "cidx")
    if len(cell_map) <= 128:
        # small probe set (serving queries): isin -> Catalyst In ->
        # parquet row-group pruning on the cidx-clustered index; the
        # per-literal py4j cost is bounded by the 128 cap
        probe = probe.filter(F.col("cidx").isin(*cell_map.keys()))
    elif len(cell_map) < n_c:
        # big probe set (dedup batches): one array literal instead of
        # n_c isin round-trips (measured whole seconds of py4j under
        # hypervisor steal). array_contains doesn't push down, but a
        # probe set this wide prunes few row groups anyway
        probe = probe.filter(
            F.array_contains(
                F.lit([int(c) for c in sorted(cell_map)]),
                F.col("cidx").cast("bigint"),
            )
        )
    return probe.mapInPandas(score, schema).distinct()


def _local_cc_keep_min(ids, mat, threshold: float, round_digits: int | None):
    """Driver-side exact within-batch resolution: pairwise cosine over
    an already-collected normalized matrix (slabbed, reduction dim
    never split — bit-identical to the distributed ``_pairs_numpy``
    sims), union-find connected components, keep each component's
    min id (singletons keep themselves). Used by
    :func:`incremental_embedding_dedup` when the survivor count fits
    the driver FLOP budget — the batch matrix is already ON the driver
    by the operator's contract, so the distributed pair graph + CC
    rounds there are pure job-floor overhead at small batch sizes
    (measured 3.4 s of a 3.0 s facet at sf0.1, round 7)."""
    import numpy as np

    n = len(ids)
    parent = list(range(n))

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    slab = 2048
    for r0 in range(0, n, slab):
        sub = mat[r0 : r0 + slab]
        for c0 in range(r0, n, slab):
            sims = sub @ mat[c0 : c0 + slab].T
            if round_digits is not None:
                sims = np.round(sims, round_digits)
            for i, j in zip(*np.nonzero(sims >= threshold)):
                gi, gj = r0 + int(i), c0 + int(j)
                if gi < gj:
                    ri, rj = find(gi), find(gj)
                    if ri != rj:
                        parent[ri] = rj
    best: dict = {}
    for i in range(n):
        r = find(i)
        v = ids[i]
        if r not in best or v < best[r]:
            best[r] = v
    return list(best.values())


# within-batch driver-resolution budget: n^2 * dim multiply-adds.
# 1e11 is ~1-3 s of driver BLAS (the driver is NOT thread-capped —
# only executor python workers pin OPENBLAS_NUM_THREADS=1), i.e.
# ~44k 64-dim vectors; bigger survivor sets take the distributed
# triangle-block + CC path. The knee is real and measured: the
# streaming-ingest probe at 80k total (20k-vector batches, 2.6e10
# FLOPs) ran 14x slower than 4x-smaller data when the old 2e10
# budget pushed every batch onto the distributed path (round 7).
_LOCAL_CC_MAX_FLOPS = 1e11


def incremental_embedding_dedup(
    batch: DataFrame,
    history: DataFrame | None = None,
    *,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assigned: DataFrame | None = None,
    centroids: DataFrame | None = None,
    n_probe: int | None = None,
    centroid_rows: list | None = None,
    round_digits: int | None = 6,
    max_iter: int = 15,
) -> DataFrame:
    """Rolling-corpus SEMANTIC dedup: drop batch vectors whose cosine
    to any already-accepted (history) vector reaches ``threshold``,
    then near-dedup the remainder within the batch (exact pair graph →
    connected components → keep each component's min id). The
    embedding-space counterpart of ``dedup.incremental_dedup`` /
    ``incremental_dedup_bloom`` (exact fingerprints) and
    ``near_dup_pairs_against_index`` (MinHash text), completing the
    family: text and embeddings both get batch, incremental, and
    index-served shapes.

    Two history-probe strategies:

    - ``history=`` (exact): :func:`max_cosine_against` — the batch is
      collected as a normalized matrix (bounded by contract: this is
      a per-ingest-batch operator) and the history corpus streams
      through one Arrow-batched BLAS matmul + vectorized per-query
      max with NO shuffle before the narrow (query, max_sim) merge.
      Per-batch cost is one history scan, independent of how many
      batches came before — but linear in history size.
    - ``assigned=``/``centroids=`` (index-served): probe a persisted
      :func:`build_ivf_hash_index` via the cell-grouped BLAS
      existence probe (:func:`_ivf_threshold_hits` — the query matrix
      and per-cell query lists ride the closure; one matmul per
      (index batch, cell), no join); only the probed cells' vectors
      are scored, so per-batch cost is probe-proportional.
      ``n_probe=None`` (default) probes EVERY centroid — exact
      (bucketing without pruning), degenerating to the flat scan's
      FLOPs. Set ``n_probe < n_centroids`` for the approximate scale
      shape and accept the documented recall trade:
      a missed true neighbor KEEPS a duplicate (never drops an
      original); the over-kept set is recoverable later by the same
      reconcile pattern as streaming text dedup.

    Contract: batch and history/index id sets must be disjoint (the
    probe excludes identical ids to support self-probing top-k, so a
    shared id would mask its own true duplicate). Within-batch
    resolution is exact regardless of probe strategy — driver-side
    union-find over the already-collected batch matrix when the
    survivor set fits ``_LOCAL_CC_MAX_FLOPS`` (bit-identical numerics,
    2 jobs instead of pair-shuffle + CC rounds), else the distributed
    ``similarity_pairs`` + ``dedup_near`` path (the 320k-probe
    regime).

    Returns the surviving batch rows with all original columns.
    """
    from pyspark.sql import types as T

    from fugue_warehouses_spark.extensions.dedup import dedup_near

    # ONE collect serves both phases: the history/index probe needs the
    # batch as a normalized query matrix, and the same matrix drives
    # the within-batch resolution below
    qids, qmat = _collect_query_matrix(batch, id_col, vec_col)
    if assigned is not None:
        if centroids is None and centroid_rows is None:
            raise ValueError("index probing needs centroids/centroid_rows")
        dropped = _ivf_threshold_hits(
            assigned,
            batch,
            threshold,
            n_probe if n_probe is not None else 1 << 30,
            centroids,
            centroid_rows,
            vec_col,
            id_col,
            vec_col,
            round_digits,
            _qmatrix=(qids, qmat),
        ).select(F.col("query_id").alias(id_col))
    elif history is not None:
        dropped = (
            max_cosine_against(
                history,
                batch,
                corpus_vec=vec_col,
                query_id=id_col,
                query_vec=vec_col,
                round_digits=round_digits,
                _qmatrix=(qids, qmat),
            )
            .filter(F.col("max_sim") >= threshold)
            .select(F.col("query_id").alias(id_col))
        )
    else:
        raise ValueError("pass history= (exact) or assigned=/centroids= (index)")

    from fugue_warehouses_spark.plans.bounded import driver_fast_path_ok

    dim = qmat.shape[1] if len(qids) else 0
    if len(qids) and driver_fast_path_ok(
        "within_batch_cc",
        flops=(float(len(qids)) ** 2 * dim, _LOCAL_CC_MAX_FLOPS),
    ):
        # the batch matrix is already on the driver (by contract) and
        # small: finish there. Collect the (batch-bounded) dropped ids,
        # resolve within-batch exactly via union-find over the same
        # numerics as _pairs_numpy, and semi-join the tiny kept-id list
        # back — 2 jobs total after the probe, vs anti-join + pair
        # shuffle + O(diameter) CC rounds
        dropped_ids = {r[0] for r in dropped.collect()}
        alive = [i for i in range(len(qids)) if qids[i] not in dropped_ids]
        kept = _local_cc_keep_min(
            qids[alive], qmat[alive], threshold, round_digits
        )
        spark = batch.sparkSession
        from fugue_warehouses_spark.plans.localframe import local_frame

        kept_df = local_frame(  # batch-sized id list — one slice
            spark,
            [(v.item() if hasattr(v, "item") else v,) for v in kept],
            T.StructType([T.StructField(id_col, batch.schema[id_col].dataType)]),
        )
        return batch.join(F.broadcast(kept_df), on=id_col, how="left_semi")

    survivors = batch.join(dropped, on=id_col, how="left_anti")
    # within-batch: exact pair graph over the (batch-sized) survivor
    # set; similarity_pairs picks broadcast vs blocked by plan stats
    pairs = similarity_pairs(
        survivors, threshold, id_col, vec_col, round_digits
    )
    return dedup_near(survivors, pairs, id_col, max_iter)
