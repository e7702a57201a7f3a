"""Round-6 instrumentation: per-leg plan capture + per-round timing.

Usage: python tools/r06_instrument.py <leg> [out_suffix]

Builds the exact bench.py inputs (same generators, same confs), then for
the requested leg:
  * captures .explain("formatted") of the result / superstep-body
    DataFrames into plans/r06/<leg>_<suffix>.txt
  * runs the leg once with per-round wall times printed as JSON
    (SuperstepRunner.history carries elapsed_sec per superstep).

Separate from bench.py (FROZEN for measurement) per the round-6 rules.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from igraph_spark.session import get_spark  # noqa: E402
from igraph_spark.generators import gnm, zipf_skew  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
M_EDGES = int(os.environ.get("BENCH_EDGES", 10_000_000))
N_VERTS = int(os.environ.get("BENCH_N", 1 << 21))
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PLANS = os.path.join(ROOT, "plans", "r06")


def _spark():
    parts = 2 * CPUS
    return get_spark(
        app_name="r06_instrument",
        master=f"local[{CPUS}]",
        shuffle_partitions=parts,
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "48g"),
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.join.preferSortMergeJoin": "false",
            "spark.local.dir": "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp",
        },
    ), parts


def _dump_plan(df, name: str) -> None:
    os.makedirs(PLANS, exist_ok=True)
    p = os.path.join(PLANS, f"{name}.txt")
    with open(p, "w") as fh:
        fh.write(df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"))
    print(f"wrote {p}", file=sys.stderr)


def noop(df) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return round(time.monotonic() - t0, 3)


def main() -> None:
    leg = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    spark, parts = _spark()
    out: dict = {"leg": leg, "suffix": suffix}

    if leg in ("pagerank", "wcc", "lpa"):
        g = zipf_skew(spark, n=N_VERTS, m=M_EDGES, alpha=2.0, seed=42,
                      directed=True).hash_partition(parts)
        g.ecount()

    if leg == "pagerank":
        from igraph_spark.algorithms.pagerank import pagerank
        spark.sparkContext.setJobDescription("pagerank warm")
        pagerank(g, damping=0.85, tol=0.0, max_iter=2, check_every=5,
                 num_partitions=parts).count()
        spark.sparkContext.setJobDescription("pagerank timed")
        import igraph_spark.checkpointing as cp
        hist_box = {}
        orig_finish = cp.SuperstepRunner.finish
        def patched_finish(self, result, completed=True):
            hist_box["hist"] = list(self.history)
            return orig_finish(self, result, completed)
        cp.SuperstepRunner.finish = patched_finish
        t0 = time.monotonic()
        res = pagerank(g, damping=0.85, tol=0.0, max_iter=10, check_every=5,
                       num_partitions=parts)
        n = res.count()
        out["wall"] = round(time.monotonic() - t0, 3)
        out["rows"] = n
        out["history"] = hist_box.get("hist")
        cp.SuperstepRunner.finish = orig_finish

    elif leg == "wcc":
        from igraph_spark.algorithms.components import connected_components
        import igraph_spark.checkpointing as cp
        hists = []
        metr = []
        orig_adv = cp.SuperstepRunner.advance
        orig_upd = cp.SuperstepRunner.update_metrics
        def patched_adv(self, step, new_state, metrics=None):
            r = orig_adv(self, step, new_state, metrics)
            hists.append((step, round(time.monotonic(), 3)))
            return r
        def patched_upd(self, step, metrics):
            metr.append((step, dict(metrics), round(time.monotonic(), 3)))
            return orig_upd(self, step, metrics)
        cp.SuperstepRunner.advance = patched_adv
        cp.SuperstepRunner.update_metrics = patched_upd
        t0 = time.monotonic()
        cc = connected_components(g, "weak", max_iter=40)
        n = cc.select("component").distinct().count()
        out["wall"] = round(time.monotonic() - t0, 3)
        out["components"] = n
        out["round_ends"] = [round(t - t0, 3) for _, t in hists]
        out["metrics"] = [(s, m, round(t - t0, 3)) for s, m, t in metr]
        cp.SuperstepRunner.advance = orig_adv
        cp.SuperstepRunner.update_metrics = orig_upd

    elif leg == "lpa":
        from igraph_spark.algorithms.lpa import label_propagation
        import igraph_spark.checkpointing as cp
        hists = []
        orig_adv = cp.SuperstepRunner.advance
        def patched_adv(self, step, new_state, metrics=None):
            r = orig_adv(self, step, new_state, metrics)
            hists.append((step, round(time.monotonic(), 3)))
            return r
        cp.SuperstepRunner.advance = patched_adv
        t0 = time.monotonic()
        lab = label_propagation(g, max_iter=6)
        n = lab.select("label").distinct().count()
        out["wall"] = round(time.monotonic() - t0, 3)
        out["labels"] = n
        out["round_ends"] = [round(t - t0, 3) for _, t in hists]
        cp.SuperstepRunner.advance = orig_adv

    elif leg == "triangles":
        from igraph_spark.algorithms.triangles import triangles_df
        tri_g = gnm(spark, n=6000, m=500_000, seed=42, directed=False)
        df = triangles_df(tri_g)
        _dump_plan(df, f"triangles_{suffix}")
        t0 = time.monotonic()
        out["count"] = df.count()
        out["wall"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        out["count2"] = df.count()
        out["wall_warm"] = round(time.monotonic() - t0, 3)

    elif leg == "cocitation":
        from igraph_spark.graph import Graph
        from igraph_spark.operators import similarity
        lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        e = (orders.join(lineitem,
                         orders["o_orderkey"] == lineitem["l_orderkey"])
             .select((F.col("o_custkey") * 2).alias("src"),
                     (F.col("l_suppkey") * 2 + 1).alias("dst"))
             .distinct())
        df = similarity.cocitation(Graph(e, directed=True))
        _dump_plan(df, f"cocitation_{suffix}")
        t0 = time.monotonic()
        out["count"] = df.count()
        out["wall"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        out["count2"] = df.count()
        out["wall_warm"] = round(time.monotonic() - t0, 3)

    elif leg == "dedup_minhash":
        from igraph_spark.functions import dedup
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        df = dedup.minhash_lsh_pairs(docs, threshold=0.5)
        _dump_plan(df, f"dedup_minhash_{suffix}")
        t0 = time.monotonic()
        out["count"] = df.count()
        out["wall"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        out["count2"] = df.count()
        out["wall_warm"] = round(time.monotonic() - t0, 3)

    elif leg == "ann_topk":
        from igraph_spark.functions import ann
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        df = ann.cosine_topk_bruteforce(emb, emb.where("vec_id < 32"), k=10)
        _dump_plan(df, f"ann_topk_{suffix}")
        t0 = time.monotonic()
        out["count"] = df.count()
        out["wall"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        out["count2"] = df.count()
        out["wall_warm"] = round(time.monotonic() - t0, 3)

    else:
        raise SystemExit(f"unknown leg {leg}")

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
