"""All-shortest-paths enumeration (structural_properties.c:870)."""

from igraph_spark import Graph, get_all_shortest_paths
from igraph_spark.generators import ring


def test_diamond_two_paths(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (0, 2), (1, 3), (2, 3)],
                             n=4, directed=True)
    rows = get_all_shortest_paths(g, [0]).collect()
    paths = {(r.id): set() for r in rows}
    for r in rows:
        paths[r.id].add(tuple(r.path))
    assert paths[0] == {(0,)}
    assert paths[1] == {(0, 1)}
    assert paths[2] == {(0, 2)}
    assert paths[3] == {(0, 1, 3), (0, 2, 3)}


def test_grid_path_counts(spark):
    # 2x3 grid: number of shortest paths (0,0)->(1,2) is C(3,1) = 3
    def vid(r, c):
        return r * 3 + c
    edges = []
    for r in range(2):
        for c in range(3):
            if c + 1 < 3:
                edges.append((vid(r, c), vid(r, c + 1)))
            if r + 1 < 2:
                edges.append((vid(r, c), vid(r + 1, c)))
    g = Graph.from_edge_list(spark, edges, n=6, directed=False)
    rows = [r for r in get_all_shortest_paths(g, [0]).collect()
            if r.id == vid(1, 2)]
    assert len(rows) == 3
    assert all(r.dist == 3 and len(r.path) == 4 for r in rows)
    assert len({tuple(r.path) for r in rows}) == 3


def test_ring_both_ways(spark):
    # even ring: the antipode has exactly two shortest paths
    g = ring(spark, 6)
    rows = [r for r in get_all_shortest_paths(g, [0]).collect()
            if r.id == 3]
    assert len(rows) == 2
    assert {tuple(r.path) for r in rows} == {(0, 1, 2, 3), (0, 5, 4, 3)}
