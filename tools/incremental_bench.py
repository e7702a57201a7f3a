"""Incremental-maintenance vs full-recompute at soak scale.

The whole point of streaming/incremental.py is the cost model: folding
a micro-batch into the converged WCC labels / running triangle count
costs work proportional to the BATCH (plus map-side scans of the
state), while the reference's shape — recompute per call
(components.c:75) — pays a full O(m)-shuffle iteration per batch.
This tool measures both sides on the sf1.0 soak graph (default
100M-edge / 2^24-vertex Zipf(2.0), same generator and confs as
tools/soak_sf1.py) and a 10k-edge batch that mixes
existing-vertex merges with brand-new arrivals, then verifies the
folded state/count against a from-scratch run on the union graph.

Usage: python tools/incremental_bench.py [edges] [n_vertices] [batch] [samples]
Writes BENCH/incremental_merge_r5.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from pyspark.sql import functions as F  # noqa: E402

from igraph_spark.session import get_spark  # noqa: E402
from igraph_spark.generators import zipf_skew  # noqa: E402
from igraph_spark.graph import Graph, SRC, DST  # noqa: E402
from igraph_spark.algorithms.triangles import triangle_count  # noqa: E402
from igraph_spark.streaming.incremental import (  # noqa: E402
    canonical_edges, components_state, merge_components,
    merge_triangle_count)


def shm_used_gib() -> float:
    u = shutil.disk_usage("/dev/shm")
    return round((u.total - u.free) / (1 << 30), 2)


def make_batch(spark, n: int, b: int, seed: int = 7):
    """b deterministic batch edges: half between existing vertices
    (cross-component merges included), half touching new arrivals
    n..n+b/4 (chains, so the label graph has transitive merges)."""
    rng = random.Random(seed)
    rows = []
    for i in range(b // 2):
        rows.append((rng.randrange(n), rng.randrange(n)))
    nv = max(1, b // 4)
    for i in range(b - b // 2):
        a = n + rng.randrange(nv)
        c = n + rng.randrange(nv) if i % 3 else rng.randrange(n)
        rows.append((a, c))
    return spark.createDataFrame(rows, f"{SRC} long, {DST} long")


def main() -> None:
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 24
    b = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000
    samples = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    parts = 2 * cpus

    spark = get_spark(
        app_name="igraph_spark_incremental_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=parts,
        extra_conf={
            "spark.driver.memory":
                os.environ.get("SPARK_DRIVER_MEMORY", "80g"),
            "spark.sql.adaptive.enabled": "false",
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
    batch = make_batch(spark, n, b).localCheckpoint(eager=True)
    union_edges = g.edges.unionByName(batch).localCheckpoint(eager=True)
    # carry g's full vertex table (isolated vertices included) plus the
    # batch arrivals, so the from-scratch run sees the same vertex set
    # the maintained state does
    union_vertices = (g.vertices.select("id")
                      .unionByName(batch.select(F.col(SRC).alias("id")))
                      .unionByName(batch.select(F.col(DST).alias("id")))
                      .distinct().localCheckpoint(eager=True))
    g_union = Graph(union_edges, union_vertices, directed=True)

    out = {"edges": m_actual, "n_vertices": n, "batch": b,
           "cpus": cpus, "setup_sec": setup_sec,
           "loadavg_at_launch": [round(x, 2) for x in os.getloadavg()],
           "samples": []}

    verified = {}
    for s in range(samples):
        rec: dict = {"shm_gib_before": shm_used_gib()}

        # --- WCC: full converge (the per-batch cost of the recompute
        # shape) vs one merge_components fold ---
        t = time.monotonic()
        state = components_state(g).localCheckpoint(eager=True)
        rec["wcc_full_sec"] = round(time.monotonic() - t, 1)

        t = time.monotonic()
        folded = merge_components(state, batch).localCheckpoint(eager=True)
        rec["wcc_fold_sec"] = round(time.monotonic() - t, 2)

        if s == 0:
            want = components_state(g_union)
            bad = (folded.exceptAll(want).count()
                   + want.exceptAll(folded).count())
            verified["wcc_state_exact"] = (bad == 0)
            assert bad == 0, f"{bad} label rows differ from full recompute"

        # --- triangles: full count (recompute shape) vs one
        # merge_triangle_count fold ---
        t = time.monotonic()
        edges_c = canonical_edges(g.edges).localCheckpoint(eager=True)
        cnt = triangle_count(
            Graph(edges_c.select(F.col("u").alias(SRC),
                                 F.col("v").alias(DST)), directed=False))
        rec["tri_full_sec"] = round(time.monotonic() - t, 1)
        rec["triangles_before"] = cnt

        t = time.monotonic()
        _, cnt2 = merge_triangle_count(edges_c, cnt, batch)
        rec["tri_fold_sec"] = round(time.monotonic() - t, 2)
        rec["triangles_after"] = cnt2

        if s == 0:
            full2 = triangle_count(Graph(
                canonical_edges(union_edges)
                .select(F.col("u").alias(SRC), F.col("v").alias(DST)),
                directed=False))
            verified["triangles_exact"] = (cnt2 == full2)
            assert cnt2 == full2, (cnt2, full2)

        rec["shm_gib_after"] = shm_used_gib()
        rec["loadavg"] = [round(x, 2) for x in os.getloadavg()]
        out["samples"].append(rec)

    best = lambda k: min(r[k] for r in out["samples"])  # noqa: E731
    out["verified"] = verified
    out["best"] = {
        "wcc_full_sec": best("wcc_full_sec"),
        "wcc_fold_sec": best("wcc_fold_sec"),
        "wcc_speedup": round(best("wcc_full_sec") / best("wcc_fold_sec"), 1),
        "tri_full_sec": best("tri_full_sec"),
        "tri_fold_sec": best("tri_fold_sec"),
        "tri_speedup": round(best("tri_full_sec") / best("tri_fold_sec"), 1),
    }
    path = os.path.join(HERE, "BENCH", sys.argv[5] if len(sys.argv) > 5
                        else "incremental_merge_r5.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"best": out["best"], "verified": verified,
                      "out": path}))
    spark.stop()


if __name__ == "__main__":
    main()
