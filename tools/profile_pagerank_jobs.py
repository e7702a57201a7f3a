"""Per-job profile of the PageRank bench leg (round-4 verdict task #2).

Runs N back-to-back pagerank samples (10 supersteps, 10M-edge Zipf
graph) in ONE session with the Spark event log enabled, then parses the
log into per-job wall time, executor GC time, and shuffle bytes, so a
slow sample is attributable to a specific superstep and a specific
cause (GC pause vs shuffle growth vs host).

Prints one JSON line per sample: {"sample": i, "sec": ..., "jobs":
[{"job": id, "sec": ..., "gc_sec": ..., "shuffle_read_mb": ...,
  "shuffle_write_mb": ...}, ...]}.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

M_EDGES = int(os.environ.get("BENCH_EDGES", 10_000_000))
N_VERTS = int(os.environ.get("BENCH_N", 1 << 21))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
LOG_DIR = "/tmp/pr_eventlog"


def main() -> None:
    from igraph_spark.session import get_spark
    from igraph_spark.generators import zipf_skew
    from igraph_spark.algorithms.pagerank import pagerank

    import shutil
    shutil.rmtree(LOG_DIR, ignore_errors=True)
    os.makedirs(LOG_DIR, exist_ok=True)
    parts = 2 * CPUS
    spark = get_spark(
        app_name="pr_profile_jobs", master=f"local[{CPUS}]",
        shuffle_partitions=parts,
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "48g"),
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.join.preferSortMergeJoin": "false",
            "spark.shuffle.compress":
                os.environ.get("BENCH_SHUFFLE_COMPRESS", "true"),
            "spark.shuffle.spill.compress":
                os.environ.get("BENCH_SHUFFLE_COMPRESS", "true"),
            "spark.local.dir": "/dev/shm",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": LOG_DIR,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        })
    g = zipf_skew(spark, n=N_VERTS, m=M_EDGES, alpha=2.0, seed=42,
                  directed=True).hash_partition(parts)
    g.ecount()
    bounds = []  # (t0, t1, wall) per sample
    for i in range(int(os.environ.get("PROFILE_SAMPLES", 3))):
        t0 = time.time()
        w0 = time.monotonic()
        pagerank(g, damping=0.85, tol=0.0, max_iter=10, check_every=5,
                 num_partitions=parts).count()
        bounds.append((t0, time.time(), round(time.monotonic() - w0, 2)))
        time.sleep(1.0)
    spark.stop()

    # ---- parse the event log --------------------------------------------
    jobs: dict[int, dict] = {}
    stage_to_job: dict[int, int] = {}
    entry = sorted(glob.glob(f"{LOG_DIR}/*"))[0]
    files = (sorted(glob.glob(f"{entry}/events_*")) if os.path.isdir(entry)
             else [entry])
    def lines():
        for p in files:
            with open(p) as fh:
                yield from fh
    if True:
        for line in lines():
            ev = json.loads(line)
            t = ev.get("Event")
            if t == "SparkListenerJobStart":
                jid = ev["Job ID"]
                jobs[jid] = {"job": jid, "t0": ev["Submission Time"] / 1e3,
                             "gc": 0.0, "sr": 0.0, "sw": 0.0}
                for sid in ev["Stage IDs"]:
                    stage_to_job[sid] = jid
            elif t == "SparkListenerJobEnd":
                jobs[ev["Job ID"]]["t1"] = ev["Completion Time"] / 1e3
            elif t == "SparkListenerTaskEnd":
                j = jobs.get(stage_to_job.get(ev["Stage ID"], -1))
                if j is None:
                    continue
                m = ev.get("Task Metrics") or {}
                j["gc"] += m.get("JVM GC Time", 0) / 1e3
                j["sr"] += (m.get("Shuffle Read Metrics", {})
                            .get("Local Bytes Read", 0)) / 1e6
                j["sr"] += (m.get("Shuffle Read Metrics", {})
                            .get("Remote Bytes Read", 0)) / 1e6
                j["sw"] += (m.get("Shuffle Write Metrics", {})
                            .get("Shuffle Bytes Written", 0)) / 1e6
    for i, (t0, t1, wall) in enumerate(bounds):
        sample_jobs = [j for j in jobs.values()
                       if "t1" in j and t0 <= j["t0"] <= t1]
        print(json.dumps({
            "sample": i, "sec": wall,
            "jobs": [{"job": j["job"], "sec": round(j["t1"] - j["t0"], 2),
                      "gc_sec": round(j["gc"], 1),
                      "shuffle_read_mb": round(j["sr"], 1),
                      "shuffle_write_mb": round(j["sw"], 1)}
                     for j in sorted(sample_jobs, key=lambda x: x["t0"])],
        }), flush=True)


if __name__ == "__main__":
    main()
