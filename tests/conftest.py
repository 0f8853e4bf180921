from __future__ import annotations

import pytest

from etl_backend_spark.session import get_spark
from etl_backend_spark.sources.catalog import Catalog

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="pytest", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def cat(spark):
    return Catalog(spark, SF_DIR)
