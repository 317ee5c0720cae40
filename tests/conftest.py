import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

from fugue_warehouses_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="wf-tests")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def tables(spark, sf_dir):
    """Register the driver's star-schema parquet tables as temp views."""
    from fugue_warehouses_spark.sources import register_star_views

    return register_star_views(spark, sf_dir)
