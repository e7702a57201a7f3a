"""sf1.0-scale soak: the iterative graph legs at 10x the bench shape.

Round-5 verdict task #1: nothing had exercised memory / skew /
checkpoint sizing above the 80M-edge weak-scaling record, while the
design brief is 10^9-edge scale.  This soak runs the headline graph
legs on a deterministic 100M-edge / 2^24-vertex (16.8M) Zipf-skewed
graph — the sf1.0 analog of the sf0.1 bench graph (10M edges /
2^21 vertices), same generator, same confs as bench.py — and prints
one JSON line with per-leg seconds, edges/s/superstep, loadavg, and
peak /dev/shm usage (the shuffle lives on tmpfs like the bench).

The relational/document legs stay in bench.py at the driver's sf_dir;
this tool isolates the scale-risk surface: the BSP engines' O(m)
shuffle and O(V) checkpointed state at 10x.

Usage: python tools/soak_sf1.py [edges] [n_vertices] [samples]
Writes BENCH/soak_sf1_r5.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from igraph_spark.session import get_spark  # noqa: E402
from igraph_spark.generators import zipf_skew  # noqa: E402
from igraph_spark.algorithms.pagerank import pagerank  # noqa: E402
from igraph_spark.algorithms.components import connected_components  # noqa: E402
from igraph_spark.algorithms.lpa import label_propagation  # noqa: E402


def main() -> None:
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 24
    samples = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    parts = 2 * cpus
    supersteps = 10

    spark = get_spark(
        app_name="igraph_spark_soak_sf1",
        master=f"local[{cpus}]",
        shuffle_partitions=parts,
        extra_conf={
            "spark.driver.memory":
                os.environ.get("SPARK_DRIVER_MEMORY", "80g"),
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.join.preferSortMergeJoin": "false",
            "spark.shuffle.compress": "true",
            "spark.shuffle.spill.compress": "true",
            "spark.local.dir":
                "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp",
        },
    )

    t0 = time.monotonic()
    g = zipf_skew(spark, n=n, m=m, alpha=2.0, seed=42,
                  directed=True).hash_partition(parts)
    m_actual = g.ecount()
    setup_sec = round(time.monotonic() - t0, 1)

    def shm_used_gib() -> float:
        u = shutil.disk_usage("/dev/shm")
        return round((u.total - u.free) / (1 << 30), 2)

    runs: list[dict] = []
    loadavgs = [[round(x, 2) for x in os.getloadavg()]]
    for _ in range(samples):
        q: dict[str, float] = {}
        shm_peak = shm_used_gib()

        def timed(name, fn):
            nonlocal shm_peak
            t = time.monotonic()
            fn()
            q[name] = round(time.monotonic() - t, 1)
            shm_peak = max(shm_peak, shm_used_gib())

        timed("pagerank_supersteps",
              lambda: pagerank(g, damping=0.85, tol=0.0,
                               max_iter=supersteps, check_every=5,
                               num_partitions=parts).count())
        timed("wcc", lambda: connected_components(g, "weak", max_iter=40)
              .select("component").distinct().count())
        timed("lpa", lambda: label_propagation(g, max_iter=6)
              .select("label").distinct().count())
        runs.append({"queries": q, "shm_peak_gib": shm_peak})
        loadavgs.append([round(x, 2) for x in os.getloadavg()])

    best = {k: min(r["queries"][k] for r in runs)
            for k in runs[0]["queries"]}
    doc = {
        "metric": "soak_sf1_graph_legs_sec",
        "value": round(sum(best.values()), 1),
        "unit": "sec",
        "queries": best,
        "edges": m_actual,
        "n_vertices": n,
        "supersteps": supersteps,
        "setup_sec": setup_sec,
        "n_samples": len(runs),
        "samples": runs,
        "loadavg_at_launch": loadavgs,
        "edges_per_sec_per_superstep": round(
            m_actual * supersteps / best["pagerank_supersteps"], 1),
        "cpus": cpus,
    }
    out = os.environ.get("SOAK_OUT", os.path.join(HERE, "BENCH", "soak_sf1_r5.json"))
    with open(out, "w") as fh:
        json.dump(doc, fh, indent=1)
    print(json.dumps(doc))
    spark.stop()


if __name__ == "__main__":
    main()
