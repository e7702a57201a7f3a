"""Betweenness: distributed Brandes vs the independent single-node
oracle; path/star closed forms; karate exact."""

import pytest

from igraph_spark.graph import Graph
from igraph_spark.algorithms.betweenness import betweenness
from igraph_spark.generators import famous, path as path_gen, star, KARATE_EDGES

from tests.oracle import betweenness_oracle


def _vals(df, n):
    rows = {r["id"]: r["betweenness"] for r in df.collect()}
    return [rows[i] for i in range(n)]


def test_path_graph(spark):
    g = path_gen(spark, 5, directed=False)
    got = _vals(betweenness(g), 5)
    assert got == pytest.approx([0.0, 3.0, 4.0, 3.0, 0.0])


def test_star_graph(spark):
    g = star(spark, 6, mode="undirected")
    got = _vals(betweenness(g), 6)
    assert got[0] == pytest.approx(10.0)   # C(5,2) pairs through center
    assert all(x == pytest.approx(0.0) for x in got[1:])


def test_directed_cycle(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 0)], n=3,
                             directed=True)
    got = _vals(betweenness(g), 3)
    # each vertex lies on exactly one shortest path (the 2-hop one)
    assert got == pytest.approx([1.0, 1.0, 1.0])


def test_karate_vs_oracle(spark):
    g = famous(spark, "Zachary")
    got = _vals(betweenness(g), 34)
    want = betweenness_oracle(34, KARATE_EDGES, directed=False)
    for i in range(34):
        assert got[i] == pytest.approx(want[i], abs=1e-6), f"vertex {i}"


def test_sampled_sources_estimator(spark):
    g = famous(spark, "Zachary")
    est = betweenness(g, sources=range(10))
    assert est.count() == 34
