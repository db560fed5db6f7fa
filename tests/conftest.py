import os
import shutil
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from incubator_iceberg_spark.session import get_spark

    s = get_spark(app_name="iiws-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture()
def warehouse(tmp_path, spark):
    from incubator_iceberg_spark import Catalog

    return Catalog(str(tmp_path / "wh"), spark)


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def lineitem(spark, sf_dir):
    from incubator_iceberg_spark.io import load_table

    return load_table(spark, sf_dir, "lineitem")


@pytest.fixture(scope="session")
def orders(spark, sf_dir):
    from incubator_iceberg_spark.io import load_table

    return load_table(spark, sf_dir, "orders")
