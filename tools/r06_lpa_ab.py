"""A/B LPA join strategies in one warm JVM, interleaved, min-of-N.

Variants: shj (unsorted halves + shuffle_hash hints, the round-6
default) vs smj_sorted (sorted halves, no hints — pagerank's chain).
Usage: python tools/r06_lpa_ab.py [reps]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from igraph_spark.session import get_spark  # noqa: E402
from igraph_spark.generators import zipf_skew  # noqa: E402
from igraph_spark.algorithms import lpa  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def main() -> None:
    parts = 2 * CPUS
    spark = get_spark(
        app_name="r06_lpa_ab", master=f"local[{CPUS}]",
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

    variants = {"shj": (False, True), "smj_sorted": (True, False)}
    times: dict[str, list[float]] = {k: [] for k in variants}
    labels_seen = set()
    lpa.label_propagation(g, max_iter=6).select("label") \
        .distinct().count()  # warmup
    for _ in range(REPS):
        for name, (sort_inc, shj) in variants.items():
            lpa.LPA_SORT_INC, lpa.LPA_SHJ_HINT = sort_inc, shj
            t0 = time.monotonic()
            n = (lpa.label_propagation(g, max_iter=6)
                 .select("label").distinct().count())
            times[name].append(round(time.monotonic() - t0, 3))
            labels_seen.add(n)
    assert len(labels_seen) == 1, labels_seen
    print(json.dumps({
        "reps": REPS, "labels": sorted(labels_seen)[0],
        "times": times,
        "min": {k: min(v) for k, v in times.items()},
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
