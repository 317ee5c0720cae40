from fugue_warehouses_spark.operators import (
    asof,
    layout,
    ranges,
    skew,
    timeseries,
    validation,
)
from fugue_warehouses_spark.operators.take import take, parse_presort

__all__ = [
    "asof",
    "layout",
    "ranges",
    "skew",
    "take",
    "parse_presort",
    "timeseries",
    "validation",
]
