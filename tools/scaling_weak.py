"""Weak-scaling evidence: constant work per core, N -> 4N cores.

The regime a real N -> 4N cluster lives in is constant per-executor
work (the corpus grows with the cluster), not a fixed corpus carved
four ways — so alongside the strong-scaling pairs this measures the
SAME north-rule job (10 PageRank supersteps, join kernel) at
2.5M edges/core on both legs: 8 cores / 20M edges and 32 cores /
80M edges, vertex count scaled proportionally (2^22 -> 2^24) so
per-core state is constant too.  Legs are back-to-back subprocess
JVMs in one host window, same confs as tools/scaling_bench.py.

Round 4 ran this shape by hand (BENCH/scaling_weak_r4.json, eff
1.00); this tool makes the harness reproducible and adds per-leg
steal-time capture.

Usage: python tools/scaling_weak.py [edges_per_core] [out_json]
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from tools.scaling_bench import run  # noqa: E402


def main() -> None:
    edges_per_core = int(sys.argv[1]) if len(sys.argv) > 1 else 2_500_000
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        HERE, "BENCH", "scaling_weak_r5.json")
    steps = 10
    load0 = [round(x, 2) for x in os.getloadavg()]
    legs = []
    prior = os.environ.get("SCALING_N_VERTICES")
    try:
        for cores, n_vert in ((8, 1 << 22), (32, 1 << 24)):
            os.environ["SCALING_N_VERTICES"] = str(n_vert)
            r = run(cores, cores * edges_per_core, steps)
            legs.append({"cores": cores, "edges": r["edges"],
                         "n_vertices": n_vert, "sec": r["sec"],
                         "steal_pct": r.get("steal_pct"),
                         "thr": round(r["edges_per_sec_per_superstep"])})
    finally:
        # scope the env mutation to the legs: a later in-process
        # scaling_bench.run() must not inherit the 32-core leg's size
        if prior is None:
            os.environ.pop("SCALING_N_VERTICES", None)
        else:
            os.environ["SCALING_N_VERTICES"] = prior
    eff = (legs[1]["thr"] / legs[1]["cores"]) / (
        legs[0]["thr"] / legs[0]["cores"])
    rec = {"pairs": legs, "weak_scaling_eff": round(eff, 3),
           "kernel": "join", "steps": steps,
           "loadavg_at_launch": load0,
           "note": "back-to-back legs in one host window; constant "
                   f"work per core ({edges_per_core} edges/core, "
                   "vertices scaled with cores)"}
    with open(out, "w") as fh:
        json.dump(rec, fh, indent=1)
        fh.write("\n")
    print(json.dumps({"weak_eff": rec["weak_scaling_eff"],
                      "thr_per_core": [round(l["thr"] / l["cores"])
                                       for l in legs], "out": out}))


if __name__ == "__main__":
    main()
