"""Headline benchmark: prints ONE JSON line
{"metric", "value", "unit": "sec", "queries": {...}, "sf", ...}.

Sections (each timed end-to-end, action included):

  * pagerank_supersteps — 10 fixed supersteps of weighted PageRank on a
    deterministic Zipf-skewed graph (hub-heavy, the BASELINE shape);
    also reported as edges/sec/superstep, the BASELINE.json metric.
  * wcc                 — hash-min + pointer-jump to convergence, same graph.
  * triangles           — degree-ordered wedge join on a G(n,m) analog of
    the reference's transitivity bench (examples/benchmarks/
    igraph_transitivity.c).
  * lpa                 — 6 semi-synchronous sweeps, same Zipf graph.
  * cocitation / agg / topk — relational operators at $SPARK_GRAFT_SF_DIR.
  * dedup_minhash / token_count / ann — documents/embeddings pipeline ops.

Noise robustness (round-3 verdict: a single contended sample recorded
a phantom 2x regression): the suite runs BENCH_SAMPLES times (default
3, oldest-first) inside one SparkSession with a short cooldown between
samples, and the headline "queries" dict is the PER-QUERY MINIMUM
across samples — the best observed time is the engine, the rest is the
host.  The JSON line carries every sample and os.getloadavg() at
launch and before each sample so a contended run is self-diagnosing.
BENCH_BUDGET_SEC (default 1500) stops sampling early if the next
sample would overrun the budget.

Scale knobs via env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
BENCH_EDGES (default 10,000,000), BENCH_N (default 2,097,152),
BENCH_SAMPLES, BENCH_BUDGET_SEC.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from igraph_spark.session import get_spark  # noqa: E402
from igraph_spark.generators import gnm, zipf_skew  # noqa: E402
from igraph_spark.algorithms.pagerank import pagerank  # noqa: E402
from igraph_spark.algorithms.components import connected_components  # noqa: E402
from igraph_spark.algorithms.lpa import label_propagation  # noqa: E402
from igraph_spark.algorithms.triangles import triangles_df  # noqa: E402
from igraph_spark.operators import similarity  # noqa: E402
from igraph_spark.functions import ann, dedup, text  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
M_EDGES = int(os.environ.get("BENCH_EDGES", 10_000_000))
N_VERTS = int(os.environ.get("BENCH_N", 1 << 21))
SUPERSTEPS = int(os.environ.get("BENCH_SUPERSTEPS", 10))
SAMPLES = int(os.environ.get("BENCH_SAMPLES", 3))
BUDGET_SEC = float(os.environ.get("BENCH_BUDGET_SEC", 1500))


def main() -> None:
    # 2x tasks per core smooths stragglers in the BSP supersteps:
    # measured +23% pagerank throughput at local[32] vs 1x (128
    # partitions regress again — scheduling overhead)
    parts = 2 * CPUS
    spark = get_spark(
        app_name="igraph_spark_bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=parts,
        extra_conf={
            "spark.driver.memory":
                os.environ.get("SPARK_DRIVER_MEMORY", "48g"),
            # measured conf matrix (see BENCH/BASELINE.md):
            # - AQE replanning costs more than it saves per superstep
            # - shuffle-hash join beats SMJ (no per-superstep sort of
            #   the cached link table)
            # - per-superstep broadcast of the n-row state loses to a
            #   partitioned join (driver collect each round)
            # - shuffle compression is HOST-DEPENDENT: on a fast-disk
            #   host the page cache absorbs raw writes and lz4 only
            #   burns CPU (round-2 box: off won by ~10%); on a
            #   writeback-bound disk raw shuffle is 2.3x SLOWER
            #   (round-3 box, 89 MB/s fdatasync: pagerank 132 s off vs
            #   58 s on).  Default on — the safe choice everywhere and
            #   what a real network-shuffle cluster wants anyway.
            #   Override with BENCH_SHUFFLE_COMPRESS=false to replay
            #   the fast-disk tuning.
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.join.preferSortMergeJoin": "false",
            "spark.shuffle.compress":
                os.environ.get("BENCH_SHUFFLE_COMPRESS", "true"),
            "spark.shuffle.spill.compress":
                os.environ.get("BENCH_SHUFFLE_COMPRESS", "true"),
            # shuffle files on tmpfs when available: local-mode stand-in
            # for a cluster node's local NVMe; decouples the measurement
            # from the sandbox's (noisy, writeback-bound) virtio disk.
            # Compressed shuffle for this suite peaks well under 10 GiB.
            "spark.local.dir": os.environ.get(
                "BENCH_LOCAL_DIR",
                "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"),
        },
    )
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]

    # ---- one-time setup (outside every timed region) --------------------
    # the BASELINE graph: Zipf-skewed, deterministic
    g = zipf_skew(spark, n=N_VERTS, m=M_EDGES, alpha=2.0, seed=42,
                  directed=True).hash_partition(parts)
    m_actual = g.ecount()  # materializes the partitioned cache
    tri_g = gnm(spark, n=6000, m=500_000, seed=42, directed=False)
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    def run_sample() -> dict[str, float]:
        queries: dict[str, float] = {}

        def timed(name: str, fn):
            t0 = time.monotonic()
            out = fn()
            queries[name] = round(time.monotonic() - t0, 3)
            return out

        timed("pagerank_supersteps",
              lambda: pagerank(g, damping=0.85, tol=0.0,
                               max_iter=SUPERSTEPS, check_every=5,
                               num_partitions=parts).count())

        timed("wcc", lambda: connected_components(g, "weak", max_iter=40)
              .select("component").distinct().count())

        timed("triangles", lambda: triangles_df(tri_g).count())

        timed("lpa", lambda: label_propagation(g, max_iter=6)
              .select("label").distinct().count())

        # ---- relational operators over the sf tables -------------------
        def run_cocitation():
            from igraph_spark.graph import Graph
            e = (orders.join(lineitem,
                             orders["o_orderkey"] == lineitem["l_orderkey"])
                 .select((F.col("o_custkey") * 2).alias("src"),
                         (F.col("l_suppkey") * 2 + 1).alias("dst"))
                 .distinct())
            return similarity.cocitation(Graph(e, directed=True)).count()

        timed("cocitation", run_cocitation)

        timed("agg_lineitem", lambda: (
            lineitem.groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum("l_quantity"), F.count("*"),
                 F.countDistinct("l_partkey")).count()))

        # ---- documents / embeddings pipeline ----------------------------
        timed("token_count", lambda: text.token_count(docs)
              .agg(F.sum("n_tokens")).count())
        timed("dedup_exact", lambda: dedup.exact_duplicates(docs).count())
        timed("dedup_minhash", lambda: dedup.minhash_lsh_pairs(
            docs, threshold=0.5).count())

        timed("ann_topk", lambda: ann.cosine_topk_bruteforce(
            emb, emb.where("vec_id < 32"), k=10).count())
        return queries

    # ---- sample loop: min-of-N is the headline --------------------------
    t_start = time.monotonic()
    samples: list[dict[str, float]] = []
    loadavgs: list[list[float]] = [
        [round(x, 2) for x in os.getloadavg()]]
    while len(samples) < SAMPLES:
        samples.append(run_sample())
        elapsed = time.monotonic() - t_start
        last = sum(samples[-1].values())
        if len(samples) < SAMPLES:
            if elapsed + last > BUDGET_SEC:
                break               # next sample would overrun the budget
            time.sleep(2.0)         # cooldown: let the OS drain writeback
            loadavgs.append([round(x, 2) for x in os.getloadavg()])

    queries = {k: min(s[k] for s in samples) for k in samples[0]}
    total = round(sum(queries.values()), 3)
    print(json.dumps({
        "metric": "headline_suite_sec",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "n_samples": len(samples),
        "samples": samples,
        "sample_totals": [round(sum(s.values()), 3) for s in samples],
        "loadavg_at_launch": loadavgs,
        "edges_per_sec_per_superstep": round(
            m_actual * SUPERSTEPS / queries["pagerank_supersteps"], 1),
        "bench_edges": m_actual,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
