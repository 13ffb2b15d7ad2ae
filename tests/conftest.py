import sys

import pytest

sys.path.insert(0, "/root/repo")

from flink_descriptive_stats_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s
