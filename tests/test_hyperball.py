"""HyperBall approximate neighborhood function (algorithms/hyperball.py).

Oracle strategy: the estimator is probabilistic but DETERMINISTIC for a
fixed seed (xxhash64 + commutative max-merge), so tests assert (a)
exact round counts / monotonicity / partitioning-invariance, and (b)
relative accuracy against the exact ``path_length_hist`` BFS on real
fixtures — the same exact/approx pairing the reference uses for its
sampled estimators.
"""

import pytest
from pyspark.sql import functions as F

from igraph_spark import generators
from igraph_spark.graph import Graph
from igraph_spark.algorithms.hyperball import (
    average_path_length_approx, closeness_approx, effective_diameter,
    hyperball, neighborhood_function)
from igraph_spark.operators.structure import path_length_hist


def _exact_nf(graph, t_max):
    """NF(t) from the exact histogram: V + cumulative pairs at dist<=t."""
    hist = {int(r["dist"]): int(r["count"])
            for r in path_length_hist(graph).collect()}
    if not graph.directed:
        # path_length_hist counts unordered pairs for undirected graphs;
        # balls are ordered (v, u) memberships
        hist = {d: 2 * c for d, c in hist.items()}
    v = graph.vcount()
    out, run = [], v
    for t in range(t_max + 1):
        if t > 0:
            run += hist.get(t, 0)
        out.append(run)
    return out


def test_directed_path_exact_rounds(spark):
    # 0->1->2->3->4: balls saturate at t=4, so the register fixpoint is
    # detected at t=5 and nf carries entries for t=0..4 exactly
    g = Graph.from_edge_list(
        spark, [(i, i + 1) for i in range(4)], n=5, directed=True)
    res = hyperball(g, mode="out", log2m=6, seed=17)
    assert res["rounds"] == 4
    ts = [t for t, _ in res["nf"]]
    assert ts == list(range(5))
    # tiny cardinalities sit in the linear-counting regime: NF(4) =
    # 5+4+3+2+1 = 15 within a few percent
    assert res["nf"][-1][1] == pytest.approx(15.0, rel=0.10)
    # NF estimates are monotone non-decreasing in t
    vals = [v for _, v in res["nf"]]
    assert all(b >= a for a, b in zip(vals, vals[1:]))


def test_modes_in_out_all(spark):
    g = Graph.from_edge_list(
        spark, [(i, i + 1) for i in range(4)], n=5, directed=True)
    # "in" balls mirror "out" balls on a path: same NF
    out_nf = hyperball(g, mode="out", seed=17)["nf"]
    in_nf = hyperball(g, mode="in", seed=17)["nf"]
    assert [t for t, _ in out_nf] == [t for t, _ in in_nf]
    assert out_nf[-1][1] == pytest.approx(in_nf[-1][1], rel=0.15)
    # "all" treats the path as undirected: every ball reaches all 5
    all_nf = hyperball(g, mode="all", seed=17)["nf"]
    assert all_nf[-1][1] == pytest.approx(25.0, rel=0.10)


def test_partitioning_invariance_bit_exact(spark):
    # max-merge is commutative/associative and the hash is per-row
    # deterministic: the final per-vertex estimates are bit-identical
    # under any input partitioning
    edges = [(i, (i * 7 + 3) % 40) for i in range(40)] + \
            [(i, i + 1) for i in range(39)]
    g1 = Graph.from_edge_list(spark, edges, n=40, directed=True)
    e2 = (spark.createDataFrame(edges, "src long, dst long")
          .repartition(7, "dst"))
    g2 = Graph(e2, vertices=g1.vertices, directed=True)
    s1 = sorted(hyperball(g1, seed=23)["state"].collect())
    s2 = sorted(hyperball(g2, seed=23)["state"].collect())
    assert s1 == s2


def test_accuracy_vs_exact_bfs(spark):
    # real graph shape: preferential attachment, 300 vertices — per-t
    # relative error of the m=64 sketch stays under 20% (HLL rse 13%)
    g = generators.barabasi(spark, 300, m=2, seed=7)
    res = hyperball(g, mode="all", log2m=6, seed=17)
    exact = _exact_nf(g, res["rounds"])
    for (t, est) in res["nf"]:
        assert est == pytest.approx(exact[t], rel=0.20), f"t={t}"


def test_effective_diameter_and_mean_distance_ring(spark):
    # C_16: diameter 8, NF(t) = 16*(2t+1) until saturation; exact mean
    # ordered-pair distance = sum(t * 2 for t in 1..7, + 8) / 15
    g = generators.ring(spark, 16)
    eff = effective_diameter(g, alpha=0.9, mode="all", seed=17)
    assert 5.0 <= eff <= 8.0
    exact_mean = (sum(t * 2 for t in range(1, 8)) + 8) / 15.0
    approx = average_path_length_approx(g, mode="all", seed=17)
    assert approx == pytest.approx(exact_mean, rel=0.20)


def test_closeness_approx_star(spark):
    # star K_{1,8}: center sum_dist = 8 (closeness 1.0), leaf sum_dist
    # = 1 + 7*2 = 15 (closeness 8/15); harmonic 8 and 4.5
    g = generators.star(spark, 9)
    out = {r["id"]: r for r in closeness_approx(g, mode="all", seed=17)
           .collect()}
    assert out[0]["closeness"] == pytest.approx(1.0, rel=0.25)
    assert out[0]["harmonic"] == pytest.approx(8.0, rel=0.25)
    assert out[3]["closeness"] == pytest.approx(8 / 15, rel=0.25)
    assert out[3]["harmonic"] == pytest.approx(4.5, rel=0.25)


def test_neighborhood_function_dataframe(spark):
    g = generators.ring(spark, 10)
    nf = neighborhood_function(g, mode="all", seed=17)
    rows = nf.orderBy("t").collect()
    assert rows[0]["t"] == 0
    assert rows[0]["nf"] == pytest.approx(10.0, rel=0.10)
    assert [r["t"] for r in rows] == list(range(len(rows)))


def test_superstep_plan_partial_max_merge(spark):
    # design-for-100x audit: the register merge must run as built-in
    # max aggregates with MAP-SIDE partial combine (hub in-degrees
    # collapse before the shuffle) under a single hash exchange on id
    # — never a collect_list / higher-order-function reduction
    from igraph_spark.algorithms.hyperball import superstep_plan
    from igraph_spark.generators import gnm
    g = gnm(spark, n=200, m=600, seed=5, directed=True)
    plan = (superstep_plan(g)._jdf.queryExecution()
            .executedPlan().toString())
    assert "partial_max" in plan, plan
    assert "collect_list" not in plan, plan


def test_resume_matches_uninterrupted(spark, tmp_path):
    edges = [(i, (i * 3 + 1) % 25) for i in range(25)] + \
            [(i, i + 1) for i in range(24)]
    g = Graph.from_edge_list(spark, edges, n=25, directed=True)
    full = hyperball(g, seed=31)
    run_dir = str(tmp_path / "hb")
    # truncated run: not converged, manifest stays resumable
    part = hyperball(g, seed=31, max_iter=2, checkpoint_every=1,
                     run_dir=run_dir)
    assert part["rounds"] == 2
    resumed = hyperball(g, seed=31, checkpoint_every=1, run_dir=run_dir)
    # per-vertex registers are integers and the per-row estimator is
    # deterministic, so the state is bit-exact; the global NF totals
    # are float SUMS whose partition order differs between the
    # parquet-reload and localCheckpoint paths — compare to 1e-12
    assert [t for t, _ in resumed["nf"]] == [t for t, _ in full["nf"]]
    for (_, a), (_, b) in zip(resumed["nf"], full["nf"]):
        assert a == pytest.approx(b, rel=1e-12)
    assert (sorted(resumed["state"].collect())
            == sorted(full["state"].collect()))
