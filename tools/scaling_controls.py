"""Host-ceiling controls for the N -> 4N scaling evidence.

Strong scaling on a single shared-memory box is bounded by the HOST
(memory bandwidth, turbo clocks, SMT sharing), not only by the engine.
These controls measure what a zero-shuffle pure-compute Spark job and
a one-shuffle aggregation scale to on the same pair of core counts,
same hour, fresh JVM per leg — the honest denominator for reading the
engine's own efficiency number (BENCH/BASELINE.md rounds 2-3 used the
same two controls ad hoc; this commits the harness).

Usage: python tools/scaling_controls.py [n_lo] [n_hi] [rows] [out_json]
Writes BENCH/scaling_controls_<lo>_<hi>.json by default.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, sys, time
sys.path.insert(0, {root!r})
from pyspark.sql import functions as F
from igraph_spark.session import get_spark

cores = int(sys.argv[1]); rows = int(sys.argv[2]); kind = sys.argv[3]
PARTS = 64
spark = get_spark(master=f"local[{{cores}}]", shuffle_partitions=PARTS,
    extra_conf={{
        "spark.driver.memory": "32g",
        "spark.sql.adaptive.enabled": "false",
        "spark.local.dir": "/dev/shm" if __import__("os").path.isdir("/dev/shm") else "/tmp",
    }})
df = spark.range(0, rows, 1, PARTS)
if kind == "cpu":
    # zero-shuffle: hash chain + global sum (one partial per partition)
    # pmod keeps the ANSI-mode sum clear of long overflow
    job = lambda: df.select(F.xxhash64("id").alias("h")) \
                    .select(F.pmod(F.xxhash64("h", "h"), F.lit(1000000007)).alias("h2")) \
                    .agg(F.sum("h2")).collect()
else:
    # one-shuffle: groupBy over a synthetic key with PARTS-width fanout
    job = lambda: df.groupBy((F.col("id") % 1000003).alias("k")) \
                    .agg(F.count("*").alias("c")).agg(F.sum("c")).collect()
job()  # JIT warmup
t0 = time.monotonic(); job(); job(); dt = (time.monotonic() - t0) / 2
print(json.dumps({{"cores": cores, "kind": kind, "sec": dt}}))
spark.stop()
"""


def run(cores: int, rows: int, kind: str) -> float:
    out = subprocess.run(
        [sys.executable, "-c", WORKER.format(root=HERE),
         str(cores), str(rows), kind],
        capture_output=True, text=True, timeout=1800, check=True)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)["sec"]


def main() -> None:
    n_lo = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_hi = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    rows = int(sys.argv[3]) if len(sys.argv) > 3 else 400_000_000
    out = sys.argv[4] if len(sys.argv) > 4 else os.path.join(
        HERE, "BENCH", f"scaling_controls_{n_lo}_{n_hi}.json")
    res = {"pair": [n_lo, n_hi], "rows": rows,
           "loadavg_at_launch": [round(x, 2) for x in os.getloadavg()],
           "controls": {}}
    for kind in ("cpu", "shuffle"):
        s_lo = run(n_lo, rows, kind)
        s_hi = run(n_hi, rows, kind)
        res["controls"][kind] = {
            f"sec_{n_lo}": round(s_lo, 3), f"sec_{n_hi}": round(s_hi, 3),
            "eff": round((s_lo / s_hi) / (n_hi / n_lo), 3)}
    with open(out, "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
