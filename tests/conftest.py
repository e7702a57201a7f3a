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
            "spark.driver.memory": "8g",
            # tiny fixtures: single shuffle partition, no AQE replanning
            # (production defaults in session.py keep AQE on)
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.autoBroadcastJoinThreshold": "10MB",
            # tmpfs scratch when available: localCheckpoint/spill never
            # touch the (slow, noisy) sandbox disk during the suite
            "spark.local.dir":
                "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp",
        },
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(autouse=True)
def _drop_leaked_caches(request, spark):
    """Operators persist intermediates (oriented edges, signatures);
    across 50+ tests those leak into the single local JVM.  Clear the
    cache after each test to keep the session bounded."""
    yield
    spark.catalog.clearCache()
