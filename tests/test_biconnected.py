"""Biconnected components / articulation points vs the reference's
fixture (examples/simple/igraph_biconnected_components.c/.out, run by
tests/components.at:29-33) plus brute-force cross-checks."""

import pytest

from igraph_spark.graph import Graph
from igraph_spark.algorithms.biconnected import (
    articulation_points, biconnected_components)


def _blocks_vertex_sets(graph):
    rows = biconnected_components(graph).collect()
    blocks = {}
    for r in rows:
        blocks.setdefault(r.block, set()).update([r.u, r.v])
    return sorted(sorted(v) for v in blocks.values())


def test_reference_fixture_blocks(spark):
    # igraph_small(&g, 7, 0,1, 1,2, 2,3, 3,0, 2,4, 4,5, 2,5)
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (2, 4), (4, 5), (2, 5)]
    g = Graph.from_edge_list(spark, edges, n=7, directed=False)
    # golden vertex sets from igraph_biconnected_components.out
    assert _blocks_vertex_sets(g) == [[0, 1, 2, 3], [2, 4, 5]]
    assert sorted(r.id for r in articulation_points(g).collect()) == [2]


def test_path_graph_every_edge_a_bridge(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 3)], n=4,
                             directed=False)
    assert _blocks_vertex_sets(g) == [[0, 1], [1, 2], [2, 3]]
    assert sorted(r.id for r in articulation_points(g).collect()) == [1, 2]


def test_cycle_has_no_articulation(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 3), (3, 0)],
                             n=4, directed=False)
    assert _blocks_vertex_sets(g) == [[0, 1, 2, 3]]
    assert articulation_points(g).count() == 0


def test_two_triangles_sharing_a_vertex(spark):
    edges = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4)]
    g = Graph.from_edge_list(spark, edges, n=5, directed=False)
    assert _blocks_vertex_sets(g) == [[0, 1, 2], [2, 3, 4]]
    assert sorted(r.id for r in articulation_points(g).collect()) == [2]


def test_disconnected_components_independent(spark):
    edges = [(0, 1), (1, 2), (5, 6), (6, 7), (5, 7)]
    g = Graph.from_edge_list(spark, edges, n=8, directed=False)
    assert _blocks_vertex_sets(g) == [[0, 1], [1, 2], [5, 6, 7]]
    assert sorted(r.id for r in articulation_points(g).collect()) == [1]


@pytest.mark.parametrize("seed", [7, 19])
def test_brute_force_agreement_random(spark, seed):
    """Articulation set equals the definition (removal disconnects
    neighbors) on a seeded sparse random graph."""
    from igraph_spark.generators import gnm
    g = gnm(spark, n=40, m=50, seed=seed, directed=False)
    edges = [(r.src, r.dst) for r in g.edges.collect()]
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)

    def is_art(v):
        nbrs = adj.get(v, set())
        if len(nbrs) < 2:
            return False
        start = min(nbrs)
        seen, stack = {start}, [start]
        while stack:
            x = stack.pop()
            for y in adj.get(x, ()):  # noqa: B905
                if y != v and y not in seen:
                    seen.add(y)
                    stack.append(y)
        return any(n not in seen for n in nbrs)

    expected = sorted(v for v in adj if is_art(v))
    got = sorted(r.id for r in articulation_points(g).collect())
    assert got == expected
