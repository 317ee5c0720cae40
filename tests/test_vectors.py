import math

from fugue_warehouses_spark.functions import vectors as V


def _one(spark, a, b, col):
    df = spark.createDataFrame([(a, b)], "a array<double>, b array<double>")
    return df.select(col.alias("v")).collect()[0]["v"]


def test_dot_norm_cosine(spark):
    assert _one(spark, [1.0, 2.0], [3.0, 4.0], V.dot("a", "b")) == 11.0
    assert _one(spark, [3.0, 4.0], [0.0], V.norm("a")) == 5.0
    c = _one(spark, [1.0, 0.0], [1.0, 0.0], V.cosine("a", "b"))
    assert abs(c - 1.0) < 1e-12
    c2 = _one(spark, [1.0, 0.0], [0.0, 1.0], V.cosine("a", "b"))
    assert abs(c2) < 1e-12
    # zero vector -> 0, not NaN
    assert _one(spark, [0.0, 0.0], [1.0, 1.0], V.cosine("a", "b")) == 0.0


def test_euclidean_and_normalize(spark):
    d = _one(spark, [0.0, 0.0], [3.0, 4.0], V.euclidean("a", "b"))
    assert d == 5.0
    n = _one(spark, [3.0, 4.0], [0.0], V.l2_normalize("a"))
    assert abs(math.hypot(*n) - 1.0) < 1e-12
