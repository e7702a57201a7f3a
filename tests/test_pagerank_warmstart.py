"""Warm-start PageRank on an evolving graph: same fixpoint, fewer
supersteps (the streaming/incremental companion path)."""

import json
import os

import numpy as np

from igraph_spark.graph import Graph
from igraph_spark.generators import famous
from igraph_spark.algorithms.pagerank import pagerank

from tests.oracle import pagerank_oracle


def _scores(df, n):
    got = {r["id"]: r["pagerank"] for r in df.collect()}
    return np.array([got[i] for i in range(n)])


def _iters(run_dir):
    with open(os.path.join(run_dir, "manifest.json")) as fh:
        return len(json.load(fh)["history"])


def test_warm_start_reaches_the_same_fixpoint(spark, tmp_path):
    g = famous(spark, "Zachary")
    n = g.vcount()
    edges = [(r["src"], r["dst"]) for r in g.edges.collect()]
    cold = pagerank(g, tol=1e-12)
    # evolve: drop the last 5 edges, warm-start from the old scores
    g2 = Graph.from_edge_list(spark, edges[:-5], n=n, directed=False)
    warm = _scores(pagerank(g2, tol=1e-12, init=cold), n)
    want = pagerank_oracle(n, edges[:-5], directed=False)
    np.testing.assert_allclose(warm, want, atol=1e-6)


def test_warm_start_converges_in_fewer_supersteps(spark, tmp_path):
    g = famous(spark, "Zachary")
    n = g.vcount()
    edges = [(r["src"], r["dst"]) for r in g.edges.collect()]
    prev = pagerank(g, tol=1e-12)
    g2 = Graph.from_edge_list(spark, edges[:-3], n=n, directed=False)
    d_cold = str(tmp_path / "cold")
    d_warm = str(tmp_path / "warm")
    pagerank(g2, tol=1e-10, check_every=1, run_dir=d_cold)
    pagerank(g2, tol=1e-10, check_every=1, run_dir=d_warm, init=prev)
    cold_iters, warm_iters = _iters(d_cold), _iters(d_warm)
    assert warm_iters < cold_iters, (warm_iters, cold_iters)


def test_warm_start_covers_new_vertices_at_uniform(spark):
    # previous scores know vertices 0..2; the evolved graph adds 3
    g1 = Graph.from_edge_list(spark, [(0, 1), (1, 2)], n=3, directed=False)
    prev = pagerank(g1, tol=1e-12)
    g2 = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 3)], n=4,
                              directed=False)
    warm = _scores(pagerank(g2, tol=1e-12, init=prev), 4)
    want = pagerank_oracle(4, [(0, 1), (1, 2), (2, 3)], directed=False)
    np.testing.assert_allclose(warm, want, atol=1e-6)
