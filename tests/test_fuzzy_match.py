"""customer_fuzzy_match: deletion-neighborhood blocking must stay
bounded (the scale contract) while reproducing the quadratic
within-nation spec exactly (oracle parity covers the latter).

Runs at sf0.01 regardless of the suite's sf_dir: the blocking claims
are about how block size scales with data, which degenerates at
sf0.001 (~6 customers per nation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fugue_warehouses_spark.queries import _deletion_variants, _t

_SF = "/root/testdata/sf0.01"


def test_block_cardinality_bounded_constant(spark):
    """Max rows per (nation, variant) block is a small constant set by
    the name alphabet (≤ ~10 digit-siblings share a deletion variant)
    — NOT proportional to nation size (~60 here, 100x more at sf1)."""
    c = _t(spark, _SF, "customer")
    mx = (
        c.select(
            F.col("c_nationkey").alias("nk"),
            F.explode(_deletion_variants("c_name")).alias("v"),
        )
        .groupBy("nk", "v")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    nation_max = (
        c.groupBy("c_nationkey").count().agg(F.max("count")).collect()[0][0]
    )
    assert mx <= 16, f"variant block grew to {mx}"
    assert mx < nation_max / 3, (
        f"blocking ({mx}) not meaningfully below nation block ({nation_max})"
    )


def test_candidate_pairs_far_below_nation_blocking(spark):
    """Pairs examined (distinct candidates sharing a variant) must be
    orders of magnitude below the within-nation quadratic count."""
    c = _t(spark, _SF, "customer")
    v = c.select(
        F.col("c_nationkey").alias("nk"),
        F.col("c_custkey").alias("k"),
        F.explode(_deletion_variants("c_name")).alias("var"),
    ).select("nk", "k", F.xxhash64("var").alias("vh"))
    other = v.select("nk", F.col("k").alias("k2"), "vh")
    n_cand = (
        v.join(other, ["nk", "vh"])
        .filter(F.col("k") < F.col("k2"))
        .select("k", "k2")
        .distinct()
        .count()
    )
    per_nation = [r["count"] for r in c.groupBy("c_nationkey").count().collect()]
    quad = sum(n * (n - 1) // 2 for n in per_nation)
    assert n_cand * 10 < quad, f"{n_cand} candidates vs {quad} quadratic"
