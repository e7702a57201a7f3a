"""Warm-start PageRank vs cold recompute at soak scale.

The third leg of the incremental-maintenance story (after the WCC and
triangle folds in tools/incremental_bench.py): when a converged score
vector exists and the graph grows by a micro-batch, `pagerank(union,
init=prev)` restarts power iteration from the old scores instead of
uniform.  Unlike the WCC/triangle folds this is NOT batch-proportional
work — every superstep still costs one O(m) join — but the superstep
COUNT becomes perturbation-proportional: a 10k-edge batch moves the
converged vector by ~|batch|/m, so the warm run needs the tail of the
geometric decay only.  The reference has no analog (PRPACK always
solves cold, prpack/prpack_solver.cpp); small-scale fixpoint parity is
tests/test_pagerank_warmstart.py and this tool is the 100M-edge
evidence.

Three legs, each in its OWN subprocess JVM (same isolation rationale
as incremental_bench.py):

  base  — converge on the 100M-edge base graph, write the scores to a
          scratch parquet (timed; this is also the "what a recompute
          costs" reference);
  cold  — converge on the union graph from uniform (timed), write the
          scores for verification;
  warm  — converge on the union graph from the base scores (timed),
          then verify max|warm - cold| against the tol-implied bound
          (two independently converged runs of the same fixpoint).

All three legs share the deterministic generator and batch recipe
(zipf 2.0, seed 42; batch seed 7 mixing existing-vertex edges with
brand-new arrivals), so the inputs are bit-identical across JVMs.

Usage: python tools/incremental_pagerank_bench.py [edges] [n_vertices]
           [batch] [tol] [out_name]
Writes BENCH/incremental_pagerank_r5.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
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
from igraph_spark.algorithms.pagerank import pagerank

leg = sys.argv[1]
m, n, b = (int(a) for a in sys.argv[2:5])
tol = float(sys.argv[5])
scratch = sys.argv[6]
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
parts = 2 * cpus
spark = get_spark(
    app_name=f"igraph_spark_incr_pr_{{leg}}",
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

# identical batch in every leg (seed 7; same shape as incremental_bench)
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


def union_graph():
    union_vertices = (g.vertices.select("id")
                      .unionByName(batch.select(F.col(SRC).alias("id")))
                      .unionByName(batch.select(F.col(DST).alias("id")))
                      .distinct())
    return Graph(g.edges.unionByName(batch), union_vertices,
                 directed=True)


def steps(run_dir):
    with open(os.path.join(run_dir, "manifest.json")) as fh:
        return len(json.load(fh)["history"])


rd = os.path.join(scratch, f"run_{{leg}}")
rec = {{"leg": leg}}
if leg == "base":
    t = time.monotonic()
    pr = pagerank(g, tol=tol, max_iter=300, run_dir=rd)
    pr.write.mode("overwrite").parquet(os.path.join(scratch, "base_pr"))
    rec["sec"] = round(time.monotonic() - t, 1)
elif leg == "cold":
    gu = union_graph()
    t = time.monotonic()
    pr = pagerank(gu, tol=tol, max_iter=300, run_dir=rd)
    pr.write.mode("overwrite").parquet(os.path.join(scratch, "cold_pr"))
    rec["sec"] = round(time.monotonic() - t, 1)
else:  # warm
    gu = union_graph()
    init = spark.read.parquet(os.path.join(scratch, "base_pr"))
    t = time.monotonic()
    pr = pagerank(gu, tol=tol, max_iter=300, run_dir=rd, init=init)
    rec["sec"] = round(time.monotonic() - t, 1)
    cold = spark.read.parquet(os.path.join(scratch, "cold_pr"))
    diff = (pr.withColumnRenamed("pagerank", "w")
            .join(cold.withColumnRenamed("pagerank", "c"), "id", "full")
            .agg(F.max(F.abs(F.coalesce("w", F.lit(0.0))
                             - F.coalesce("c", F.lit(0.0)))).alias("d"),
                 F.count("*").alias("rows")).first())
    rec["max_abs_diff_vs_cold"] = float(diff.d)
    rec["rows"] = int(diff.rows)
    # both runs stopped at delta < tol; each is within ~tol*d/(1-d) of
    # the shared fixpoint in the infinity norm, so the cross-run gap is
    # bounded by ~2*tol*0.85/0.15 = 11.4*tol; assert with headroom
    assert diff.d < 100 * tol, (diff.d, tol)
    rec["verified"] = True
rec["supersteps"] = steps(rd)
rec["edges"] = m_actual
rec["loadavg"] = [round(x, 2) for x in os.getloadavg()]
print(json.dumps(rec))
spark.stop()
'''


def run_leg(leg: str, m: int, n: int, b: int, tol: float,
            scratch: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER.format(root=HERE),
         leg, str(m), str(n), str(b), repr(tol), scratch],
        capture_output=True, text=True,
        timeout=int(os.environ.get("INC_LEG_TIMEOUT", "3600")))
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if out.returncode != 0 or not lines:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError(f"{leg} leg failed rc={out.returncode}")
    return json.loads(lines[-1])


def main() -> None:
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 24
    b = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000
    tol = float(sys.argv[4]) if len(sys.argv) > 4 else 1e-7
    name = sys.argv[5] if len(sys.argv) > 5 else "incremental_pagerank_r5.json"

    scratch = ("/dev/shm/incr_pr_bench" if os.path.isdir("/dev/shm")
               else "/tmp/incr_pr_bench")
    os.makedirs(scratch, exist_ok=True)
    out = {"edges": m, "n_vertices": n, "batch": b, "tol": tol,
           "loadavg_at_launch": [round(x, 2) for x in os.getloadavg()],
           "legs": {}}
    try:
        for leg in ("base", "cold", "warm"):
            out["legs"][leg] = run_leg(leg, m, n, b, tol, scratch)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    cold, warm = out["legs"]["cold"], out["legs"]["warm"]
    out["speedup_wall"] = round(cold["sec"] / warm["sec"], 1)
    out["speedup_supersteps"] = round(
        cold["supersteps"] / warm["supersteps"], 1)

    path = os.path.join(HERE, "BENCH", name)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"cold_sec": cold["sec"],
                      "cold_steps": cold["supersteps"],
                      "warm_sec": warm["sec"],
                      "warm_steps": warm["supersteps"],
                      "speedup": out["speedup_wall"],
                      "max_abs_diff": warm["max_abs_diff_vs_cold"],
                      "out": path}))


if __name__ == "__main__":
    main()
