"""Vector column functions over array<float|double> — JVM-side expressions.

Dot products / norms / cosine via ``zip_with`` + ``aggregate`` so the
hot path never leaves whole-stage codegen. All arithmetic is forced to
double with a fixed left-to-right accumulation order, which makes
results bit-reproducible and comparable against the DuckDB oracle's
list functions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def as_double_array(col: Column | str) -> Column:
    return F.transform(_c(col), lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    denominator = norm(a) * norm(b)
    return F.when(denominator == 0, F.lit(0.0)).otherwise(dot(a, b) / denominator)


def euclidean(a: Column | str, b: Column | str) -> Column:
    diffs = F.zip_with(
        _c(a), _c(b), lambda x, y: (x.cast("double") - y.cast("double"))
    )
    return F.sqrt(F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x * x))


def l2_normalize(a: Column | str) -> Column:
    n = norm(a)
    return F.when(n == 0, as_double_array(a)).otherwise(
        F.transform(_c(a), lambda x: x.cast("double") / n)
    )
