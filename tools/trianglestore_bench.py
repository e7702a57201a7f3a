"""Triangle-fold scan floor: bucketed store vs flat accumulated set.

Three batch profiles per accumulated size (the statestore-style honest
split — hash-bucket pruning is proportional to
min(#distinct endpoints, B)/B):

  * uniform10k — 10k edges over the whole id space (20k endpoints >> B:
    NO pruning possible; the adaptive fold reads flat — this row is
    the documented floor, expected ~parity with the flat layout),
  * hub10k     — 10k edges among 96 hot vertices (the hub-update /
    concentrated-stream case: a handful of buckets),
  * tiny100    — a 100-edge micro-batch (the fine-grained streaming
    case: ~200 endpoints).

Counts are asserted equal to the flat `_new_triangles` fold on every
profile.  Prints one JSON line; raw per-row progress on stderr.

Usage: python tools/trianglestore_bench.py [sizes_csv] [out.json]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from pyspark.sql import functions as F  # noqa: E402

from igraph_spark.session import get_spark  # noqa: E402
from igraph_spark.streaming.incremental import (  # noqa: E402
    canonical_edges, _batch_minus_state, _new_triangles)
from igraph_spark.streaming.trianglestore import BucketedEdgeStore  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
SIZES = [int(x) for x in
         (sys.argv[1] if len(sys.argv) > 1 else "10000000,40000000"
          ).split(",")]
OUT = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
    HERE, "BENCH", "r06", "trianglestore_scale.json")
N_VERT = 1 << 22
BUCKETS = 256


def _batch(spark, n, seed_a, seed_b, space):
    return spark.range(n).select(
        F.pmod(F.xxhash64("id", F.lit(seed_a)), F.lit(space)).alias("src"),
        F.pmod(F.xxhash64("id", F.lit(seed_b)), F.lit(space)).alias("dst"))


def main() -> None:
    spark = get_spark(
        app_name="trianglestore_bench", master=f"local[{CPUS}]",
        shuffle_partitions=2 * CPUS,
        extra_conf={"spark.driver.memory": "48g",
                    "spark.sql.adaptive.enabled": "false",
                    "spark.local.dir": "/dev/shm"})
    base = "/dev/shm/tristore_bench"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    profiles = {
        "uniform10k": dict(n=10_000, space=N_VERT),
        "hub10k": dict(n=10_000, space=96),
        "tiny100": dict(n=100, space=N_VERT),
    }
    rows = []
    try:
        for m in SIZES:
            acc = canonical_edges(
                _batch(spark, m, 1, 2, N_VERT))
            flat = os.path.join(base, f"flat_{m}")
            acc.write.mode("overwrite").parquet(flat)
            st = BucketedEdgeStore(spark, os.path.join(base, f"bk_{m}"),
                                   n_buckets=BUCKETS)
            t0 = time.monotonic()
            st.fold_epoch(acc.select(F.col("u").alias("src"),
                                     F.col("v").alias("dst")), 0)
            t_build = round(time.monotonic() - t0, 3)
            epoch = 1
            for pname, p in profiles.items():
                batch = _batch(spark, p["n"], 7 + epoch, 8 + epoch,
                               p["space"])
                edges = spark.read.parquet(flat)
                t0 = time.monotonic()
                b = _batch_minus_state(canonical_edges(batch), edges)
                d_flat = _new_triangles(edges, b)
                t_flat = round(time.monotonic() - t0, 3)
                before = st.triangle_count()
                t0 = time.monotonic()
                st.fold_epoch(batch, epoch)
                t_bucket = round(time.monotonic() - t0, 3)
                d_bucket = st.triangle_count() - before
                # NOTE: flat side folds into the ORIGINAL set each time
                # while the store accumulates — keep them comparable by
                # folding the flat side's edges too
                if not b.isEmpty():
                    b_edges = (edges.unionByName(b))
                    b_edges.write.mode("overwrite").parquet(flat + "_tmp")
                    shutil.rmtree(flat)
                    os.rename(flat + "_tmp", flat)
                assert d_bucket == d_flat, (pname, d_bucket, d_flat)
                rows.append({
                    "accumulated_edges": m, "profile": pname,
                    "batch": p["n"], "new_triangles": d_flat,
                    "flat_fold_sec": t_flat,
                    "bucketed_fold_sec": t_bucket,
                    "bucketed_build_sec": t_build,
                    "pruned_files_last_read":
                        len(st._pruned_input_files),
                    "loadavg": [round(x, 2) for x in os.getloadavg()]})
                print(json.dumps(rows[-1]), file=sys.stderr)
                epoch += 1
    finally:
        shutil.rmtree(base, ignore_errors=True)
    doc = {"n_buckets": BUCKETS, "rows": rows}
    with open(OUT, "w") as fh:
        json.dump(doc, fh, indent=1)
    print(json.dumps(doc))
    spark.stop()


if __name__ == "__main__":
    main()
