"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001;
``queries()``/``oracle_sql()`` expose the CURATED driver registry from
fugue_warehouses_spark/driver_suite.py — 48 entries (28 headline
keeps + 20 family suites; tests/test_driver_suite.py re-counts and
enforces <= 50), sized to the driver's 50-row correctness window
while covering every operator family from SURVEY.md §2 plus the
north-star extensions: headline operators keep full-row hash checks,
and family "suite" entries fold the remaining facet queries into
per-facet (n_rows, content-checksum) rows with exact DuckDB twins.
The facet-level registry (fugue_warehouses_spark/queries.py) stays
fully oracle-mirrored in tests/test_oracle_parity.py; every facet is
either a driver keep or a member of exactly one suite
(tests/test_driver_suite.py enforces the closure).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fugue_warehouses_spark import driver_suite as DS  # noqa: E402
from fugue_warehouses_spark import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    return Q.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return DS.driver_queries()


def oracle_sql() -> dict[str, str]:
    return DS.driver_oracles()
