"""Subgraph isomorphism (topology.c:780, VF2 analog) — counting
identities on known graphs."""

from igraph_spark.graph import Graph
from igraph_spark.generators import famous, full
from igraph_spark.algorithms.isomorphism import count_subisomorphisms
from igraph_spark.algorithms.triangles import triangle_count


def test_triangle_mappings_karate(spark):
    k = famous(spark, "Zachary")
    tri = [(0, 1), (1, 2), (0, 2)]
    # every triangle admits 3! injective mappings
    assert count_subisomorphisms(k, tri) == 6 * triangle_count(k) == 270


def test_wedge_mappings_equal_degree_identity(spark):
    k = famous(spark, "Zachary")
    deg = {r.id: r.degree for r in k.degree("all").collect()}
    expected = sum(d * (d - 1) for d in deg.values())
    assert count_subisomorphisms(k, [(0, 1), (1, 2)]) == expected


def test_induced_vs_plain_on_clique(spark):
    g = full(spark, 4)
    assert count_subisomorphisms(g, [(0, 1), (1, 2)], induced=True) == 0
    assert count_subisomorphisms(g, [(0, 1), (1, 2)]) == 24


def test_directed_cycle_rotations(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 0)], n=3,
                             directed=True)
    cyc = [(0, 1), (1, 2), (2, 0)]
    assert count_subisomorphisms(g, cyc) == 3
    # (the reversed cycle is isomorphic to C3 itself — also 3)
    rev = [(1, 0), (2, 1), (0, 2)]
    assert count_subisomorphisms(g, rev) == 3
    # an in-star needs in-degree 2; C3 has none
    instar = [(0, 1), (2, 1)]
    assert count_subisomorphisms(g, instar) == 0


def test_four_cycle_in_diamond(spark):
    # diamond (two triangles sharing edge 1-2): the 4-cycle 0-1-3-2 has
    # the 1-2 chord, so it embeds plainly (8 mappings: 4 rotations x 2
    # directions) but NOT as an induced subgraph
    edges = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)]
    g = Graph.from_edge_list(spark, edges, n=4, directed=False)
    c4 = [(0, 1), (1, 2), (2, 3), (3, 0)]
    assert count_subisomorphisms(g, c4) == 8
    assert count_subisomorphisms(g, c4, induced=True) == 0
    # the plain chordless 4-cycle graph has it induced: 8 mappings
    g2 = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 3), (0, 3)],
                              n=4, directed=False)
    assert count_subisomorphisms(g2, c4, induced=True) == 8
