"""A/B WCC variants in one warm JVM, interleaved, min-of-N per variant.

Usage: python tools/r06_wcc_ab.py [reps]
Variants toggled by monkeypatching components.JUMP_BCAST_ROWS.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from igraph_spark.session import get_spark  # noqa: E402
from igraph_spark.generators import zipf_skew  # noqa: E402
from igraph_spark.algorithms import components  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def main() -> None:
    parts = 2 * CPUS
    spark = get_spark(
        app_name="r06_wcc_ab", master=f"local[{CPUS}]",
        shuffle_partitions=parts,
        extra_conf={
            "spark.driver.memory": "48g",
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.join.preferSortMergeJoin": "false",
            "spark.local.dir": "/dev/shm",
        })
    g = zipf_skew(spark, n=1 << 21, m=10_000_000, alpha=2.0, seed=42,
                  directed=True).hash_partition(parts)
    g.ecount()

    variants = {"bcast_on": 1 << 19, "bcast_off": 0}
    times: dict[str, list[float]] = {k: [] for k in variants}
    # warmup
    components.connected_components(g, "weak", max_iter=40) \
        .select("component").distinct().count()
    for _ in range(REPS):
        for name, thr in variants.items():
            components.JUMP_BCAST_ROWS = thr
            t0 = time.monotonic()
            n = (components.connected_components(g, "weak", max_iter=40)
                 .select("component").distinct().count())
            times[name].append(round(time.monotonic() - t0, 3))
            assert n == 684, n
    print(json.dumps({
        "reps": REPS,
        "times": times,
        "min": {k: min(v) for k, v in times.items()},
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
