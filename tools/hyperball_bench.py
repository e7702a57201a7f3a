"""HyperBall two-parallelism scaling evidence (round 5).

Same methodology as tools/scaling_bench.py: the N -> 4N executor
criterion is evidenced by the SAME job on the SAME deterministic
input at local[8] and local[32]; each measurement is a fresh
subprocess JVM with a 1-superstep JIT warmup, partition count fixed
across runs.  The job is a fixed number of HyperBall max-merge
supersteps (m=64 registers) on the Zipf-skew hub graph — the
operator whose entire reason to exist is the 10^12-edge regime where
the exact distance family is O(V*E).

Usage: python tools/hyperball_bench.py [edges] [steps] [out_json]
Prints one JSON line and writes the artifact (default
BENCH/hyperball_scaling_r5.json).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, sys, time
sys.path.insert(0, {root!r})
from igraph_spark.session import get_spark
from igraph_spark.generators import zipf_skew
from igraph_spark.algorithms.hyperball import hyperball

cores = int(sys.argv[1]); m = int(sys.argv[2]); steps = int(sys.argv[3])
import os as _os
N_VERT = int(_os.environ.get("SCALING_N_VERTICES", 1 << 21))
MEM = _os.environ.get("SCALING_DRIVER_MEM", "48g")
PARTS = 64  # fixed across runs: >= 2x the larger core count
spark = get_spark(master=f"local[{{cores}}]", shuffle_partitions=PARTS,
    extra_conf={{
        "spark.driver.memory": MEM,
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.join.preferSortMergeJoin": "false",
        "spark.shuffle.compress": "true",
        "spark.shuffle.spill.compress": "true",
        "spark.local.dir": "/dev/shm" if __import__("os").path.isdir("/dev/shm") else "/tmp",
    }})
g = zipf_skew(spark, n=N_VERT, m=m, seed=42, directed=True).hash_partition(PARTS)
m_actual = g.ecount()
hyperball(g, mode="out", log2m=6, seed=17, max_iter=1)  # JIT warmup
t0 = time.monotonic()
res = hyperball(g, mode="out", log2m=6, seed=17, max_iter=steps)
res["state"].count()
dt = time.monotonic() - t0
print(json.dumps({{"cores": cores, "sec": dt, "edges": m_actual,
                   "steps": steps, "rounds": res["rounds"],
                   "edges_per_sec_per_superstep": m_actual * steps / dt}}))
spark.stop()
"""


def run_one(cores: int, edges: int, steps: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER.format(root=HERE),
         str(cores), str(edges), str(steps)],
        capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    edges = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    out_path = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        HERE, "BENCH", "hyperball_scaling_r5.json")
    load0 = os.getloadavg()
    lo = run_one(8, edges, steps)
    hi = run_one(32, edges, steps)
    eff = (hi["edges_per_sec_per_superstep"]
           / lo["edges_per_sec_per_superstep"]) / 4.0
    rec = {"job": "hyperball m=64 max-merge supersteps, zipf-skew graph",
           "loadavg_at_launch": list(load0),
           "low": lo, "high": hi, "scaling_efficiency_8_to_32": eff}
    with open(out_path, "w") as fh:
        json.dump(rec, fh, indent=2)
        fh.write("\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
