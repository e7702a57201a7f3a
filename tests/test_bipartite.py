"""Bipartite detection + projection (bipartite.c)."""

from igraph_spark.graph import Graph
from igraph_spark.generators import famous, ring
from igraph_spark.operators.bipartite import (
    bipartite_projection, is_bipartite)


def test_even_ring_bipartite_odd_not(spark):
    assert is_bipartite(ring(spark, 6))[0] is True
    assert is_bipartite(ring(spark, 5))[0] is False


def test_karate_not_bipartite(spark):
    assert is_bipartite(famous(spark, "Zachary"))[0] is False


def test_loop_breaks_bipartiteness(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 1)], n=2, directed=False)
    assert is_bipartite(g)[0] is False


def test_projection_weights(spark):
    # customers {0,1} x products {10,11,12}; 0 and 1 share product 11
    g = Graph.from_edge_list(spark, [(0, 10), (0, 11), (1, 11), (1, 12)],
                             directed=False)
    ok, types = is_bipartite(g)
    assert ok
    proj = bipartite_projection(g, types, which=0)
    got = sorted((r.src, r.dst, r.weight) for r in proj.edges.collect())
    assert got == [(0, 1, 1.0)]
    # other side: products sharing a customer
    proj1 = bipartite_projection(g, types, which=1)
    got1 = sorted((r.src, r.dst, r.weight) for r in proj1.edges.collect())
    assert got1 == [(10, 11, 1.0), (11, 12, 1.0)]
