import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_crawler_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    sp = get_spark("pytest", cpus=8, shuffle_partitions=8)
    yield sp
    sp.stop()


@pytest.fixture(scope="session")
def sf_small() -> str:
    return os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
