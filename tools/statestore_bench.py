"""Durable incremental-fold cost: full-rewrite epochs vs bucketed store.

``fold_components_epoch`` persists the WHOLE (id, comp) table per
micro-batch — the O(V) durable-write floor noted in BENCH/BASELINE.md's
incremental section.  ``BucketedComponentStore`` rewrites only the
buckets of the labels a batch touches, so its durable cost is
DATA-DEPENDENT: proportional to the number of affected label buckets,
not to |V|.  This tool measures both sides of that dependence with the
same harness:

* profile ``clustered`` — the amortization case: every batch's merge
  edges land inside a handful of components and the new vertices
  attach to those same components (locality is the normal shape of a
  stream: a crawl frontier, a community's activity burst).  Expected:
  a few buckets rewritten out of hundreds, durable MB per fold
  collapsing accordingly.
* profile ``scattered`` — the adversarial floor for MERGES: every
  merge edge picks two uniformly random components, so ~2·|batch|
  distinct labels hash into (nearly) every bucket and the store
  degenerates to a full rewrite plus bucketing overhead.  Reported as
  the honest worst case.
* profile ``arrivals`` — brand-new vertex pairs only: no stored row
  relabels, so the store's LSM-lite delta path appends O(|batch|)
  bytes without reading or rewriting ANY bucket, regardless of how
  the new labels hash (this kills the scattered floor for the
  arrival half of a workload; the merge half keeps it).

Both legs seed the same converged state (``n`` vertices in components
of ``comp_size``, comp = min member id — a valid converged label
table), fold the same ``k`` batches, and the two pipelines' final
states are verified row-identical per profile.

Usage: python tools/statestore_bench.py [n] [batch] [k] [n_buckets] [out]
Writes BENCH/<out> (default statestore_r5.json) and prints one JSON line.

Scratch goes to /dev/shm like the other soak tools; a cluster
deployment writes to DFS, where the rewrite-volume gap this measures
is the per-batch network+disk gap.
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

from pyspark.sql import functions as F                      # noqa: E402
from igraph_spark.session import get_spark                  # noqa: E402
from igraph_spark.graph import SRC, DST                     # noqa: E402
from igraph_spark.streaming.incremental import (            # noqa: E402
    fold_components_epoch)
from igraph_spark.streaming.statestore import (             # noqa: E402
    BucketedComponentStore)


def dir_stats(path: str) -> tuple[int, float]:
    files = mb = 0
    for root, _, names in os.walk(path):
        for f in names:
            if f.endswith(".parquet"):
                files += 1
                mb += os.path.getsize(os.path.join(root, f)) / (1 << 20)
    return files, round(mb, 1)


def make_batches(spark, profile: str, n: int, b: int, k: int,
                 comp_size: int) -> list:
    """``clustered``: merges and arrivals inside 20 components per
    batch; ``scattered``: uniformly random endpoints; ``arrivals``:
    brand-new vertex pairs only (no stored row relabels — the store's
    LSM-lite delta path)."""
    rng = random.Random(11)
    batches = []
    for i in range(k):
        rows = []
        if profile == "arrivals":
            base = n + (i + 1) * 100 * b
            rows = [(base + 2 * j, base + 2 * j + 1)
                    for j in range(b // 2)]
        elif profile == "clustered":
            comps = [rng.randrange(n // comp_size) * comp_size
                     for _ in range(20)]
            for _ in range(b // 2):
                ca, cb = rng.choice(comps), rng.choice(comps)
                rows.append((ca + rng.randrange(comp_size),
                             cb + rng.randrange(comp_size)))
            base = n + (i + 1) * 10 * b   # new ids, disjoint per profile
            rows += [(base + j, rng.choice(comps) +
                      rng.randrange(comp_size))
                     for j in range(b - b // 2)]
        else:
            rows = [(rng.randrange(n), rng.randrange(n))
                    for _ in range(b // 2)]
            base = n + (i + 1) * 10 * b + 5 * b
            rows += [(base + j,
                      base + j + 1 if j % 3 else rng.randrange(n))
                     for j in range(b - b // 2)]
        batches.append(spark.createDataFrame(
            rows, f"{SRC} long, {DST} long").localCheckpoint(eager=True))
    return batches


def run_profile(spark, scratch: str, profile: str, state, n: int, b: int,
                k: int, n_buckets: int, comp_size: int, cpus: int) -> dict:
    batches = make_batches(spark, profile, n, b, k, comp_size)
    res = {}

    # ---- leg A: full-rewrite epochs --------------------------------------
    full_path = os.path.join(scratch, f"full_{profile}")
    t = time.monotonic()
    (state.repartition(2 * cpus, "id")
     .write.mode("overwrite").parquet(os.path.join(full_path, "epoch=-1")))
    with open(os.path.join(full_path, "_LATEST"), "w") as fh:
        json.dump({"epoch": -1}, fh)
    res["full_seed_sec"] = round(time.monotonic() - t, 1)
    legA = []
    for i, batch in enumerate(batches):
        t = time.monotonic()
        assert fold_components_epoch(batch, i, full_path,
                                     num_partitions=2 * cpus)
        sec = round(time.monotonic() - t, 2)
        files, mb = dir_stats(os.path.join(full_path, f"epoch={i}"))
        legA.append({"fold_sec": sec, "files": files, "mb_written": mb})
    res["full_epoch"] = legA

    # ---- leg B: bucketed store -------------------------------------------
    bk_path = os.path.join(scratch, f"bucketed_{profile}")
    store = BucketedComponentStore(spark, bk_path, n_buckets=n_buckets)
    t = time.monotonic()
    store.initialize(state)
    res["bucketed_seed_sec"] = round(time.monotonic() - t, 1)
    legB = []
    for i, batch in enumerate(batches):
        t = time.monotonic()
        stats = store.apply_batch(batch, epoch_id=i + 1)
        sec = round(time.monotonic() - t, 2)
        files = mb = 0
        for d in (f"epoch={i + 1}", f"shared={i + 1}",
                  f"shared={i + 1}m"):     # this fold's leaves only
            p = os.path.join(bk_path, d)
            if os.path.isdir(p):
                f2, m2 = dir_stats(p)
                files += f2
                mb += m2
        legB.append({"fold_sec": sec,
                     "buckets_rewritten": stats["n_buckets_rewritten"],
                     "shared_delta_rows": stats.get("shared_delta_rows", 0),
                     "files": files, "mb_written": round(mb, 2)})
    res["bucketed"] = legB

    # ---- exactness: both pipelines end in the same state ------------------
    final_full = spark.read.parquet(os.path.join(full_path,
                                                 f"epoch={k - 1}"))
    final_bk = store.state()
    bad = (final_full.exceptAll(final_bk).count()
           + final_bk.exceptAll(final_full).count())
    res["verified_identical"] = bad == 0
    assert bad == 0, f"{profile}: {bad} rows differ between pipelines"

    a = min(r["fold_sec"] for r in legA)
    bsec = min(r["fold_sec"] for r in legB)
    res["best_fold_sec"] = {"full_epoch": a, "bucketed": bsec,
                            "speedup": round(a / bsec, 2)}
    res["mb_per_fold"] = {
        "full_epoch": min(r["mb_written"] for r in legA),
        "bucketed": min(r["mb_written"] for r in legB)}
    return res


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 24
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    n_buckets = int(sys.argv[4]) if len(sys.argv) > 4 else 512
    name = sys.argv[5] if len(sys.argv) > 5 else "statestore_r5.json"
    comp_size = 16
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    scratch = "/dev/shm/statestore_bench" if os.path.isdir("/dev/shm") \
        else "/tmp/statestore_bench"
    shutil.rmtree(scratch, ignore_errors=True)
    os.makedirs(scratch)
    # durable state dirs can be pointed at real disk (deployment
    # analogy: shuffle scratch is node-local/ephemeral, the state
    # store is persistent storage) while shuffle stays on tmpfs
    durable = os.environ.get("STATESTORE_DURABLE_DIR", scratch)
    if durable != scratch:
        shutil.rmtree(durable, ignore_errors=True)
        os.makedirs(durable)

    spark = get_spark(app_name="igraph_spark_statestore_bench",
                      master=f"local[{cpus}]",
                      shuffle_partitions=2 * cpus,
                      extra_conf={
                          "spark.driver.memory":
                              os.environ.get("SPARK_DRIVER_MEMORY", "48g"),
                          "spark.local.dir": scratch,
                      })

    state = (spark.range(n)
             .select(F.col("id"),
                     (F.col("id") - F.col("id") % comp_size).alias("comp")))

    out = {"n_vertices": n, "batch": b, "k": k, "n_buckets": n_buckets,
           "comp_size": comp_size, "cpus": cpus,
           "loadavg_at_launch": [round(x, 2) for x in os.getloadavg()],
           "profiles": {}}
    out["durable_dir"] = durable
    profiles = tuple(os.environ.get(
        "STATESTORE_PROFILES", "clustered,scattered,arrivals").split(","))
    for profile in profiles:
        out["profiles"][profile] = run_profile(
            spark, durable, profile, state, n, b, k, n_buckets,
            comp_size, cpus)
    out["loadavg_at_end"] = [round(x, 2) for x in os.getloadavg()]

    dest = os.path.join(HERE, "BENCH", name)
    with open(dest, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(scratch, ignore_errors=True)
    if durable != scratch:
        shutil.rmtree(durable, ignore_errors=True)


if __name__ == "__main__":
    main()
