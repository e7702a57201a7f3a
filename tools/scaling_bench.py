"""Two-parallelism scaling evidence (BASELINE.json north rule).

No real multi-executor cluster exists in this sandbox, so the N -> 4N
executor criterion is evidenced by running the SAME job on the SAME
deterministic input at local[8] and local[32] (task instruction /
BASELINE.md).  Everything except the core count is held fixed:
partition count, checkpoint interval, input graph, superstep count.

Each measurement runs in its own subprocess (fresh JVM, no page-cache
help from the sibling) and does a 2-superstep JIT warmup before the
timed window.

Usage: python tools/scaling_bench.py [edges] [out_md]
Writes BENCH/BASELINE.md and prints one JSON line.
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
from igraph_spark.algorithms.pagerank import pagerank

cores = int(sys.argv[1]); m = int(sys.argv[2]); steps = int(sys.argv[3])
kernel = sys.argv[4] if len(sys.argv) > 4 else "join"
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
pagerank(g, tol=0.0, max_iter=2, check_every=2, num_partitions=PARTS,
         kernel=kernel).count()  # JIT warmup


def cpu_ticks():
    # aggregate /proc/stat cpu line: user nice system idle iowait irq
    # softirq steal ... — steal is time the hypervisor ran SOMEONE
    # ELSE while this guest had runnable vCPUs: the direct measurement
    # of the host-neighbor contention the pair series keeps inferring
    # from throughput swings.
    with open("/proc/stat") as fh:
        f = [int(x) for x in fh.readline().split()[1:]]
    return sum(f), (f[7] if len(f) > 7 else 0)


tot0, st0 = cpu_ticks()
t0 = time.monotonic()
pagerank(g, tol=0.0, max_iter=steps, check_every=5, num_partitions=PARTS,
         kernel=kernel).count()
dt = time.monotonic() - t0
tot1, st1 = cpu_ticks()
steal_pct = round(100.0 * (st1 - st0) / max(1, tot1 - tot0), 2)
print(json.dumps({{"cores": cores, "sec": dt, "edges": m_actual,
                   "kernel": kernel,
                   "steps": steps,
                   "steal_pct": steal_pct,
                   "edges_per_sec_per_superstep": m_actual * steps / dt}}))
spark.stop()
"""


def run(cores: int, m: int, steps: int, kernel: str = "join") -> dict:
    script = WORKER.format(root=HERE)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cores), str(m), str(steps), kernel],
        capture_output=True, text=True,
        timeout=int(os.environ.get("SCALING_LEG_TIMEOUT", "1800")), check=True)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_lo = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_hi = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    kernel = sys.argv[4] if len(sys.argv) > 4 else "join"
    out_md = sys.argv[5] if len(sys.argv) > 5 else os.path.join(
        HERE, "BENCH", f"scaling_{n_lo}_{n_hi}"
        + ("" if kernel == "join" else f"_{kernel}") + ".json")
    steps = 10
    r8 = run(n_lo, m, steps, kernel)
    r32 = run(n_hi, m, steps, kernel)
    thr8, thr32 = (r8["edges_per_sec_per_superstep"],
                   r32["edges_per_sec_per_superstep"])
    eff = (thr32 / thr8) / (n_hi / n_lo)
    os.makedirs(os.path.dirname(out_md), exist_ok=True)
    with open(out_md, "w") as fh:
        json.dump({"n_lo": n_lo, "n_hi": n_hi, "kernel": kernel,
                   "edges": r8["edges"],
                   "steps": steps, "sec_lo": r8["sec"],
                   "sec_hi": r32["sec"], "thr_lo": thr8, "thr_hi": thr32,
                   "steal_pct_lo": r8.get("steal_pct"),
                   "steal_pct_hi": r32.get("steal_pct"),
                   "eff": eff}, fh, indent=1)
    print(json.dumps({"pair": [n_lo, n_hi], "eff": round(eff, 3),
                      "thr_lo": round(thr8), "thr_hi": round(thr32),
                      "out": out_md}))


if __name__ == "__main__":
    main()
