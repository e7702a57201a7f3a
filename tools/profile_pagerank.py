"""Profile the PageRank superstep conf levers (round-4 verdict task #2).

Runs 10 fixed supersteps of weighted PageRank on the BASELINE Zipf graph
(10M edges, 2^21 vertices) under each conf variant in a FRESH
SparkSession, and prints one JSON line per variant:

    {"variant": ..., "sec": ..., "edges_per_sec_per_superstep": ...,
     "loadavg": [...]}

Variants cover the levers named in the round-3 verdict: shuffle
compression on/off (the round-3 conf forced ON for the degraded disk;
shuffle dirs now live on tmpfs where compression only buys memory-bus
bytes), codec lz4/zstd/lzf, and a narrower link-table shuffle row.

Usage: python tools/profile_pagerank.py [variant ...]
(no args = all variants, oldest-first with cooldowns)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

M_EDGES = int(os.environ.get("BENCH_EDGES", 10_000_000))
N_VERTS = int(os.environ.get("BENCH_N", 1 << 21))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
SUPERSTEPS = 10

VARIANTS: dict[str, dict[str, str]] = {
    "compress_on_lz4": {"spark.shuffle.compress": "true",
                        "spark.shuffle.spill.compress": "true",
                        "spark.io.compression.codec": "lz4"},
    "compress_off": {"spark.shuffle.compress": "false",
                     "spark.shuffle.spill.compress": "false"},
    "compress_on_zstd": {"spark.shuffle.compress": "true",
                         "spark.shuffle.spill.compress": "true",
                         "spark.io.compression.codec": "zstd"},
    "compress_on_lzf": {"spark.shuffle.compress": "true",
                        "spark.shuffle.spill.compress": "true",
                        "spark.io.compression.codec": "lzf"},
}


def run_variant(name: str, conf: dict[str, str]) -> dict:
    from igraph_spark.session import get_spark
    from igraph_spark.generators import zipf_skew
    from igraph_spark.algorithms.pagerank import pagerank

    parts = 2 * CPUS
    extra = {
        "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "48g"),
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.join.preferSortMergeJoin": "false",
        "spark.local.dir": os.environ.get(
            "BENCH_LOCAL_DIR",
            "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"),
    }
    extra.update(conf)
    spark = get_spark(app_name=f"pr_profile_{name}", master=f"local[{CPUS}]",
                      shuffle_partitions=parts, extra_conf=extra)
    g = zipf_skew(spark, n=N_VERTS, m=M_EDGES, alpha=2.0, seed=42,
                  directed=True).hash_partition(parts)
    m_actual = g.ecount()
    load = [round(x, 2) for x in os.getloadavg()]
    samples = []
    for _ in range(int(os.environ.get("PROFILE_SAMPLES", 3))):
        t0 = time.monotonic()
        pagerank(g, damping=0.85, tol=0.0, max_iter=SUPERSTEPS,
                 check_every=5, num_partitions=parts).count()
        samples.append(round(time.monotonic() - t0, 2))
        time.sleep(1.0)
    sec = min(samples)
    spark.stop()
    return {"variant": name, "sec": sec, "samples": samples,
            "edges_per_sec_per_superstep": round(
                m_actual * SUPERSTEPS / sec, 1),
            "loadavg": load}


def main() -> None:
    names = sys.argv[1:] or list(VARIANTS)
    for i, name in enumerate(names):
        if i:
            time.sleep(3.0)
        print(json.dumps(run_variant(name, VARIANTS[name])), flush=True)


if __name__ == "__main__":
    main()
