import sys

import pytest

sys.path.insert(0, "/root/repo")

from gdal_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="gdal_spark_tests", master="local[4]")
    yield s
    s.stop()
