import sys

import pytest

sys.path.insert(0, "/root/repo")

from parkour_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session("parkour_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
