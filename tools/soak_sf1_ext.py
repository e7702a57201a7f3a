"""sf1.0 soak, part 2: the non-BSP heavy legs at 10x the bench shape.

The round-5 sf1 soak (tools/soak_sf1.py) exercised the BSP engines
(pagerank / wcc / lpa) at 100M edges; this companion exercises the
remaining scale-risk surfaces the bench runs only at sf0.1:

  * triangles_zipf  — degree-oriented wedge join on the SAME
    100M-edge / 2^24-vertex Zipf(2.0) graph the BSP soak used.  This
    is the skew surface: hub vertices make naive wedge enumeration
    quadratic; the engine's degree-struct orientation must bound the
    fan-out at the hubs for the 100-TB story to hold.
  * triangles_dense — G(60000, 5M), the 10x-edge analog of the bench's
    dense G(6000, 500k) triangle leg at the same mean degree (~166):
    the wedge-volume (not skew) surface.

Same artifact discipline as every round-5 bench: min-of-N per leg,
per-sample data, launch loadavg, peak /dev/shm.  Usage:

    python tools/soak_sf1_ext.py [zipf_edges] [samples]

Writes BENCH/soak_sf1_ext_r5.json (override with SOAK_OUT).
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
from igraph_spark.generators import gnm, zipf_skew  # noqa: E402
from igraph_spark.algorithms.triangles import triangle_count  # noqa: E402


def main() -> None:
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    samples = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n = 1 << 24
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    parts = 2 * cpus

    spark = get_spark(
        app_name="igraph_spark_soak_sf1_ext",
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
    g_zipf = zipf_skew(spark, n=n, m=m, alpha=2.0, seed=42,
                       directed=True).hash_partition(parts)
    m_zipf = g_zipf.ecount()
    g_dense = gnm(spark, n=60_000, m=5_000_000, seed=42, directed=False)
    setup_sec = round(time.monotonic() - t0, 1)

    def shm_used_gib() -> float:
        u = shutil.disk_usage("/dev/shm")
        return round((u.total - u.free) / (1 << 30), 2)

    runs: list[dict] = []
    counts: dict[str, int] = {}
    loadavgs = [[round(x, 2) for x in os.getloadavg()]]
    for _ in range(samples):
        q: dict[str, float] = {}
        shm_peak = shm_used_gib()

        def timed(name, fn):
            nonlocal shm_peak
            t = time.monotonic()
            counts[name] = fn()
            q[name] = round(time.monotonic() - t, 1)
            shm_peak = max(shm_peak, shm_used_gib())

        timed("triangles_zipf", lambda: triangle_count(g_zipf))
        timed("triangles_dense", lambda: triangle_count(g_dense))
        runs.append({"queries": q, "shm_peak_gib": shm_peak})
        loadavgs.append([round(x, 2) for x in os.getloadavg()])

    best = {k: min(r["queries"][k] for r in runs)
            for k in runs[0]["queries"]}
    doc = {
        "metric": "soak_sf1_ext_triangle_legs_sec",
        "value": round(sum(best.values()), 1),
        "unit": "sec",
        "queries": best,
        "triangle_counts": counts,
        "zipf_edges": m_zipf,
        "zipf_vertices": n,
        "dense_edges": 5_000_000,
        "dense_vertices": 60_000,
        "setup_sec": setup_sec,
        "n_samples": len(runs),
        "samples": runs,
        "loadavg_at_launch": loadavgs,
        "cpus": cpus,
    }
    out = os.environ.get(
        "SOAK_OUT", os.path.join(HERE, "BENCH", "soak_sf1_ext_r5.json"))
    with open(out, "w") as fh:
        json.dump(doc, fh, indent=1)
    print(json.dumps(doc))
    spark.stop()


if __name__ == "__main__":
    main()
