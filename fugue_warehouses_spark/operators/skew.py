"""Skew-mitigation join: key salting.

AQE's skew-join splitting (on in session.py) handles most skew at
runtime by splitting oversized partitions of a sort-merge join. Salting
is the explicit lever for the remaining case — a join key whose single
value is so hot that even a split partition overwhelms one task, or a
plan where AQE cannot apply (e.g. the skewed side feeds other operators
that pin its partitioning).

Mechanics: the skewed (big) side gets a uniform random salt in
[0, salt); the other side is exploded into ``salt`` copies, one per
salt value. The join key becomes (key, salt), spreading each hot key
over ``salt`` tasks. Cost: the small side is replicated ``salt`` times
— keep it the dimension side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Equi-join ``skewed`` with ``other`` on same-named key columns,
    spreading each key of the skewed side over ``salt`` tasks.

    Supported ``how``: inner / left (left = skewed side). Result equals
    ``skewed.join(other, on, how)`` row-for-row; only the physical
    distribution differs.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' or 'left'")
    salted_l = skewed.withColumn(
        "__salt", (F.rand(seed) * salt).cast("int")
    )
    salted_r = other.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt - 1))),
    )
    out = salted_l.join(salted_r, on=[*on, "__salt"], how=how)
    return out.drop("__salt")
