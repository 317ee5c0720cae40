"""salted_join must be row-equivalent to the plain join."""

from __future__ import annotations

from pyspark.sql import functions as F

from fugue_warehouses_spark.operators.skew import salted_join


def _skewed_fixture(spark):
    # 90% of fact rows share key 0 — the hot-key shape salting targets
    fact = spark.range(0, 2000).select(
        F.when(F.col("id") % 10 != 0, F.lit(0))
        .otherwise(F.col("id"))
        .alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(0, 2000, 10).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    dim = dim.union(spark.createDataFrame([(0, 0)], "k long, w long")).distinct()
    return fact, dim


def test_salted_inner_matches_plain(spark):
    fact, dim = _skewed_fixture(spark)
    plain = sorted(tuple(r) for r in fact.join(dim, ["k"]).collect())
    salted = sorted(tuple(r) for r in salted_join(fact, dim, ["k"]).collect())
    assert salted == plain
    assert len(plain) > 0


def test_salted_left_matches_plain(spark):
    fact, dim = _skewed_fixture(spark)
    # drop key 0 from dim so left join produces nulls for the hot key
    dim2 = dim.filter(F.col("k") != 0)
    plain = sorted(
        tuple(r) for r in fact.join(dim2, ["k"], "left").collect()
    )
    salted = sorted(
        tuple(r) for r in salted_join(fact, dim2, ["k"], how="left").collect()
    )
    assert salted == plain
    # hot-key rows survive with null dim columns
    assert sum(1 for r in plain if r[0] == 0 and r[2] is None) > 0


def test_salted_join_rejects_unsupported_how(spark):
    fact, dim = _skewed_fixture(spark)
    try:
        salted_join(fact, dim, ["k"], how="right")
        assert False, "expected ValueError"
    except ValueError:
        pass
