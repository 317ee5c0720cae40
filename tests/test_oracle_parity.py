"""Local mirror of the driver's correctness gate: run every registered
query on Spark AND its oracle SQL on DuckDB over the same parquet,
compare row count, column names, and (order-insensitively) values.

Runs at sf0.001 by default for speed; set SPARK_GRAFT_SF_DIR to
/root/testdata/sf0.01 to mirror the driver's t2 exactly.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from fugue_warehouses_spark.queries import ORACLE, QUERIES

_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in _TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v, ndigits=6):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, ndigits)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x, ndigits) for x in v)
    return v


def _rows_to_set(cols, rows, ndigits=6):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm(r[i], ndigits) for i in order) for r in rows), key=repr
    )


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(spark, sf_dir, ddb, name):
    sdf = QUERIES[name](spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = list(sdf.columns)

    rel = ddb.sql(ORACLE[name])
    dcols = list(rel.columns)
    drows = [tuple(r) for r in rel.fetchall()]

    assert sorted(scols) == sorted(dcols), f"{name}: columns differ"
    assert len(srows) == len(drows), (
        f"{name}: row count {len(srows)} vs oracle {len(drows)}"
    )
    a = _rows_to_set(scols, srows)
    b = _rows_to_set(dcols, drows)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{name}: {len(mismatches)} rows differ; first: {mismatches[:3]}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_rows_only_queries_run(spark, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    n = sdf.count()
    assert n >= 0
    assert len(sdf.columns) > 0
