"""load_jdbc: partitioned-federation plumbing.

No JDBC driver jar ships in this container, so the reader is mocked at
the DataFrameReader.jdbc boundary — the tests assert the engine hands
Spark the exact sharding spec (range mode / predicate mode), which is
the part this repo owns; the actual partitioned fetch is Spark's
built-in JDBC source.
"""

from __future__ import annotations

import pytest
from pyspark.sql.readwriter import DataFrameReader

from fugue_warehouses_spark.engine import SparkWarehouseEngine


@pytest.fixture()
def eng(spark):
    return SparkWarehouseEngine(spark)


@pytest.fixture()
def jdbc_spy(spark, monkeypatch):
    calls = []

    def fake_jdbc(self, url, table, **kwargs):
        calls.append({"url": url, "table": table, **kwargs})
        return spark.createDataFrame(
            [(1, "a"), (2, "b")], "id long, name string"
        )

    monkeypatch.setattr(DataFrameReader, "jdbc", fake_jdbc)
    return calls


def test_range_mode_passes_sharding_spec(eng, jdbc_spy):
    out = eng.load_jdbc(
        "jdbc:postgresql://db/warehouse",
        "public.orders",
        partition_column="o_orderkey",
        lower_bound=0,
        upper_bound=1_000_000,
        num_partitions=16,
        columns=["id"],
        driver="org.postgresql.Driver",
        fetchsize="10000",
    )
    assert out.columns == ["id"]  # column pruning applied
    (call,) = jdbc_spy
    assert call["table"] == "public.orders"
    assert call["column"] == "o_orderkey"
    assert call["lowerBound"] == 0
    assert call["upperBound"] == 1_000_000
    assert call["numPartitions"] == 16
    assert call["properties"]["driver"] == "org.postgresql.Driver"
    assert call["properties"]["fetchsize"] == "10000"


def test_predicate_mode_one_partition_per_restriction(eng, jdbc_spy):
    preds = ["region = 'EU'", "region = 'US'", "region NOT IN ('EU','US')"]
    eng.load_jdbc("jdbc:trino://host/cat", "t", predicates=preds)
    (call,) = jdbc_spy
    assert call["predicates"] == preds
    assert "column" not in call


def test_mode_validation(eng, jdbc_spy):
    with pytest.raises(ValueError, match="not both"):
        eng.load_jdbc(
            "jdbc:x", "t", partition_column="c", predicates=["a=1"]
        )
    with pytest.raises(ValueError, match="range mode needs"):
        eng.load_jdbc("jdbc:x", "t", partition_column="c")
    assert not jdbc_spy  # rejected before reaching Spark


def test_query_as_source(eng, jdbc_spy):
    eng.load_jdbc("jdbc:x", "(SELECT id FROM t WHERE x > 5) q")
    assert jdbc_spy[0]["table"].startswith("(SELECT")
