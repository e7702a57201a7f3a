"""Triangle / transitivity fixtures (FIXTURES.md §3.2, §3.5):
karate 45 triangles, per-vertex counts vs brute-force oracle,
loop/multi-edge dedup, NaN/zero modes."""

import math

from igraph_spark.graph import Graph
from igraph_spark.algorithms.triangles import (
    triangle_count, adjacent_triangles, transitivity_undirected,
    transitivity_local_undirected, list_triangles)
from igraph_spark.generators import famous, KARATE_EDGES

from tests.oracle import triangle_oracle


def test_karate_triangle_count(spark):
    g = famous(spark, "Zachary")
    assert triangle_count(g) == 45


def test_karate_per_vertex(spark):
    g = famous(spark, "Zachary")
    got = {r["id"]: r["triangles"] for r in adjacent_triangles(g).collect()}
    _, want = triangle_oracle(KARATE_EDGES)
    for v in range(34):
        assert got[v] == want.get(v, 0), f"vertex {v}"


def test_karate_global_transitivity(spark):
    g = famous(spark, "Zachary")
    _, per_vertex = triangle_oracle(KARATE_EDGES)
    deg = {}
    for u, v in KARATE_EDGES:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    triples = sum(d * (d - 1) / 2 for d in deg.values())
    want = 3 * 45 / triples
    assert abs(transitivity_undirected(g) - want) < 1e-12


def test_local_transitivity_modes(spark):
    # path 0-1-2 plus triangle 2-3-4: vertex 0 has deg 1 => NaN/0
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (2, 4)]
    g = Graph.from_edge_list(spark, edges, n=5, directed=False)
    got_nan = {r["id"]: r["transitivity"]
               for r in transitivity_local_undirected(g, "nan").collect()}
    assert math.isnan(got_nan[0])
    assert got_nan[1] == 0.0           # deg 2, no triangle
    assert abs(got_nan[3] - 1.0) < 1e-12
    got_zero = {r["id"]: r["transitivity"]
                for r in transitivity_local_undirected(g, "zero").collect()}
    assert got_zero[0] == 0.0


def test_loops_and_multiedges_ignored(spark):
    # triangle + loop + duplicated edge + reversed duplicate
    edges = [(0, 1), (1, 2), (2, 0), (0, 0), (0, 1), (1, 0)]
    g = Graph.from_edge_list(spark, edges, n=3, directed=True)
    assert triangle_count(g) == 1      # directions ignored (triangles.c:552)


def test_list_triangles(spark):
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 0)]
    g = Graph.from_edge_list(spark, edges, n=4, directed=False)
    tris = [(r["a"], r["b"], r["c"]) for r in list_triangles(g).collect()]
    assert tris == [(0, 1, 2), (0, 2, 3)]


def test_no_triangles(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2)], n=3, directed=False)
    assert triangle_count(g) == 0
    t = transitivity_undirected(g)
    assert t == 0.0  # one triple exists (vertex 1), zero triangles
