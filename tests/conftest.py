import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from igraph_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="igraph_spark_tests",
        master="local[4]",
        shuffle_partitions=1,
        extra_conf={
            "spark.driver.memory": "4g",
            # tiny fixtures: single shuffle partition, no AQE replanning
            # (production defaults in session.py keep AQE on)
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.autoBroadcastJoinThreshold": "10MB",
        },
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
