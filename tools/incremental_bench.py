"""Incremental-maintenance vs full-recompute at soak scale.

The whole point of streaming/incremental.py is the cost model: folding
a micro-batch into the converged WCC labels / running triangle count
costs work proportional to the BATCH (plus map-side scans of the
state), while the reference's shape — recompute per call
(components.c:75) — pays a full O(m)-shuffle iteration per batch.
This tool measures both sides on the sf1.0 soak graph (default
100M-edge / 2^24-vertex Zipf(2.0), same generator and confs as
tools/soak_sf1.py) and a 10k-edge batch that mixes existing-vertex
merges with brand-new arrivals, then verifies the folded state/count
against a from-scratch run on the union graph.

Each leg (wcc / triangles) runs in its OWN subprocess JVM: the
verification doubles the big-table footprint, and one JVM holding the
leg's states plus two full runs' shuffle files on /dev/shm OOMed the
125 GiB box at 80g heap (OOM-killer log, first attempt) — fresh JVM
per leg halves the peak and app exit wipes its shuffle dirs.

Usage: python tools/incremental_bench.py [edges] [n_vertices] [batch] [samples]
Writes BENCH/incremental_merge_r5.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r'''
import json, os, random, shutil, sys, time
sys.path.insert(0, {root!r})
from pyspark.sql import functions as F
from igraph_spark.session import get_spark
from igraph_spark.generators import zipf_skew
from igraph_spark.graph import Graph, SRC, DST
from igraph_spark.algorithms.triangles import triangle_count
from igraph_spark.streaming.incremental import (canonical_edges,
    components_state, merge_components, merge_triangle_count)

leg = sys.argv[1]
m, n, b, samples = (int(a) for a in sys.argv[2:6])
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
parts = 2 * cpus
spark = get_spark(
    app_name=f"igraph_spark_incremental_{{leg}}",
    master=f"local[{{cpus}}]", shuffle_partitions=parts,
    extra_conf={{
        "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "56g"),
        "spark.sql.adaptive.enabled": "false",
        "spark.shuffle.compress": "true",
        "spark.shuffle.spill.compress": "true",
        "spark.local.dir":
            "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp",
    }})

g = zipf_skew(spark, n=n, m=m, alpha=2.0, seed=42,
              directed=True).hash_partition(parts)
m_actual = g.ecount()

rng = random.Random(7)
rows = []
for i in range(b // 2):
    rows.append((rng.randrange(n), rng.randrange(n)))
nv = max(1, b // 4)
for i in range(b - b // 2):
    a = n + rng.randrange(nv)
    c = n + rng.randrange(nv) if i % 3 else rng.randrange(n)
    rows.append((a, c))
batch = spark.createDataFrame(
    rows, f"{{SRC}} long, {{DST}} long").localCheckpoint(eager=True)
# plain plan over the persisted edge partitions — a localCheckpoint
# here would hold a second 100M-row copy for the whole leg
union_edges = g.edges.unionByName(batch)


def shm_gib():
    u = shutil.disk_usage("/dev/shm")
    return round((u.total - u.free) / (1 << 30), 2)


recs, verified = [], None
for s in range(samples):
    rec = {{"shm_gib_before": shm_gib()}}
    if leg == "wcc":
        t = time.monotonic()
        state = components_state(g).localCheckpoint(eager=True)
        rec["full_sec"] = round(time.monotonic() - t, 1)
        t = time.monotonic()
        folded = merge_components(state, batch).localCheckpoint(eager=True)
        rec["fold_sec"] = round(time.monotonic() - t, 2)
        if s == 0:
            union_vertices = (g.vertices.select("id")
                .unionByName(batch.select(F.col(SRC).alias("id")))
                .unionByName(batch.select(F.col(DST).alias("id")))
                .distinct())
            want = components_state(
                Graph(union_edges, union_vertices, directed=True))
            bad = (folded.exceptAll(want).count()
                   + want.exceptAll(folded).count())
            verified = bad == 0
            assert bad == 0, f"{{bad}} label rows differ"
    else:
        t = time.monotonic()
        edges_c = canonical_edges(g.edges).localCheckpoint(eager=True)
        cnt = triangle_count(
            Graph(edges_c.select(F.col("u").alias(SRC),
                                 F.col("v").alias(DST)), directed=False))
        rec["full_sec"] = round(time.monotonic() - t, 1)
        rec["triangles_before"] = cnt
        t = time.monotonic()
        _, cnt2 = merge_triangle_count(edges_c, cnt, batch)
        rec["fold_sec"] = round(time.monotonic() - t, 2)
        rec["triangles_after"] = cnt2
        if s == 0:
            full2 = triangle_count(Graph(
                canonical_edges(union_edges)
                .select(F.col("u").alias(SRC), F.col("v").alias(DST)),
                directed=False))
            verified = cnt2 == full2
            assert cnt2 == full2, (cnt2, full2)
    rec["shm_gib_after"] = shm_gib()
    rec["loadavg"] = [round(x, 2) for x in os.getloadavg()]
    recs.append(rec)

print(json.dumps({{"leg": leg, "edges": m_actual, "samples": recs,
                   "verified": verified}}))
spark.stop()
'''


def run_leg(leg: str, m: int, n: int, b: int, samples: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER.format(root=HERE),
         leg, str(m), str(n), str(b), str(samples)],
        capture_output=True, text=True,
        timeout=int(os.environ.get("INC_LEG_TIMEOUT", "3000")))
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if out.returncode != 0 or not lines:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError(f"{leg} leg failed rc={out.returncode}")
    return json.loads(lines[-1])


def main() -> None:
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 24
    b = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000
    samples = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    name = sys.argv[5] if len(sys.argv) > 5 else "incremental_merge_r5.json"

    out = {"edges": m, "n_vertices": n, "batch": b,
           "loadavg_at_launch": [round(x, 2) for x in os.getloadavg()],
           "legs": {}}
    for leg in ("wcc", "tri"):
        r = run_leg(leg, m, n, b, samples)
        best_full = min(s["full_sec"] for s in r["samples"])
        best_fold = min(s["fold_sec"] for s in r["samples"])
        r["best"] = {"full_sec": best_full, "fold_sec": best_fold,
                     "speedup": round(best_full / best_fold, 1)}
        out["legs"][leg] = r

    path = os.path.join(HERE, "BENCH", name)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"wcc": out["legs"]["wcc"]["best"],
                      "tri": out["legs"]["tri"]["best"],
                      "verified": [out["legs"]["wcc"]["verified"],
                                   out["legs"]["tri"]["verified"]],
                      "out": path}))


if __name__ == "__main__":
    main()
