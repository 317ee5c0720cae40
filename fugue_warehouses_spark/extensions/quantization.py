"""Int8 embedding quantization for the similarity path at scale.

A float32 embedding column is 4 bytes/dim; symmetric int8 quantization
(per-vector scale = max|x|/127, q = round(x/scale)) cuts that 4x with
~0.5% cosine error at 128 dims — at 100 TB that is the difference
between an embedding corpus that fits executor memory for bucketed
re-ranking and one that doesn't. Scoring stays in the integer domain
(exact int dot product) and rescales by the two scalar factors.

Determinism across engines: rounding is spelled ``floor(x/s + 0.5)``
— the same double op in Spark and DuckDB — rather than each engine's
round() (Spark rounds via BigDecimal shortest-repr, DuckDB rounds raw
doubles; they disagree on boundary values). The integer dot is exact,
and the rescale multiplies identical doubles, so the quantized score
is bit-identical in the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_EPS = 1e-30  # zero-vector guard: scale stays positive


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    q_col: str = "qv",
    scale_col: str = "q_scale",
) -> DataFrame:
    """Add ``q_col`` (array<tinyint>) and ``scale_col`` (double)."""
    v = F.col(vec_col)
    max_abs = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = F.greatest(max_abs, F.lit(_EPS)) / F.lit(127.0)
    q = F.transform(v, lambda x: F.floor(x / scale + F.lit(0.5)).cast("tinyint"))
    return df.withColumn(scale_col, scale).withColumn(q_col, q)


def dequantize(q_col: str | Column, scale_col: str | Column) -> Column:
    q = F.col(q_col) if isinstance(q_col, str) else q_col
    s = F.col(scale_col) if isinstance(scale_col, str) else scale_col
    return F.transform(q, lambda x: x.cast("double") * s)


def quantized_dot(qa: Column, sa: Column, qb: Column, sb: Column) -> Column:
    """Rescaled integer dot product of two quantized vectors."""
    prods = F.zip_with(qa, qb, lambda a, b: a.cast("long") * b.cast("long"))
    idot = F.aggregate(prods, F.lit(0).cast("long"), lambda acc, x: acc + x)
    return idot.cast("double") * sa * sb


def _quantize_numpy(mat):
    """numpy twin of ``quantize_int8``: identical IEEE ops
    (max|x|/127 scale, floor(x/s + 0.5) rounding) so the int matrix
    and scales are bit-identical to the expression path and the
    DuckDB oracle."""
    import numpy as np

    scales = np.maximum(np.abs(mat).max(axis=1), _EPS) / 127.0
    q = np.floor(mat / scales[:, None] + 0.5).astype("int64")
    return q, scales


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    round_digits: int = 6,
) -> DataFrame:
    """Top-k by quantized dot product: the query set (bounded by
    contract, like brute_force_topk) rides in the UDF closure as an
    int8 matrix + scales; the corpus streams through one Arrow
    ``mapInPandas`` pass doing an integer BLAS matmul per batch —
    ~50x fewer per-pair costs than an expression-tree dot, no corpus
    shuffle, and the rescale multiplies the same doubles in the same
    order as the expression path, so scores stay bit-identical to the
    DuckDB twin."""
    import numpy as np
    from pyspark.sql import types as T

    from fugue_warehouses_spark.extensions.similarity import _topk_scaffold

    rows = queries.select(id_col, vec_col).collect()
    qids = np.asarray([r[0] for r in rows])
    if len(rows) == 0:
        qint = np.zeros((0, 0), dtype="int64")
        qscales = np.zeros((0,), dtype="float64")
    else:
        qmat = np.array([list(r[1]) for r in rows], dtype="float64")
        qint, qscales = _quantize_numpy(qmat)
    schema = T.StructType(
        [
            T.StructField("query_id", queries.schema[id_col].dataType),
            T.StructField("match_id", corpus.schema[id_col].dataType),
            T.StructField("q_dot", T.DoubleType()),
        ]
    )

    def compute(pdf):
        ids = pdf[id_col].to_numpy()
        cmat = np.stack(pdf[vec_col].to_numpy()).astype("float64")
        cint, cscales = _quantize_numpy(cmat)
        idot = cint @ qint.T  # (batch, n_q) exact int64
        # same association as quantized_dot: (idot * s_query) * s_corpus
        sims = (idot.astype("float64") * qscales[None, :]) * cscales[:, None]
        return ids, sims, {}

    return _topk_scaffold(
        corpus,
        [id_col, vec_col],
        schema,
        "q_dot",
        qids,
        k,
        round_digits,
        compute,
        lambda j, ids, extras: ids != qids[j],
    )
