"""Maximal cliques (maximal_cliques.c:322) vs brute-force
Bron-Kerbosch, plus adjacency conversions (conversion.c:69)."""

import pytest

from igraph_spark.graph import Graph
from igraph_spark.generators import famous, full, gnm
from igraph_spark.algorithms.cliques import maximal_cliques
from igraph_spark.operators.structure import get_adjacency, from_adjacency


def _brute_maximal(edges, n):
    adj = {v: set() for v in range(n)}
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    out = []

    def bk(r, p, x):
        if not p and not x:
            out.append(sorted(r))
            return
        for v in sorted(p):
            bk(r | {v}, p & adj[v], x & adj[v])
            p = p - {v}
            x = x | {v}

    bk(set(), set(range(n)), set())
    return sorted(out)


def _got(graph):
    return sorted(sorted(r.clique) for r in maximal_cliques(graph).collect())


def test_complete_graph_single_clique(spark):
    assert _got(full(spark, 5)) == [[0, 1, 2, 3, 4]]


def test_barbell_with_isolated_vertex(spark):
    edges = [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5), (2, 3)]
    g = Graph.from_edge_list(spark, edges, n=7, directed=False)
    assert _got(g) == [[0, 1, 2], [2, 3], [3, 4, 5], [6]]


@pytest.mark.parametrize("seed", [3, 17])
def test_random_graph_matches_bron_kerbosch(spark, seed):
    g = gnm(spark, n=25, m=80, seed=seed, directed=False)
    edges = [(r.src, r.dst) for r in g.edges.collect()]
    assert _got(g) == _brute_maximal(edges, 25)


def test_karate_36_maximal_cliques(spark):
    k = famous(spark, "Zachary")
    got = _got(k)
    assert len(got) == 36  # known value for Zachary's karate club
    assert got == _brute_maximal([(r.src, r.dst)
                                  for r in k.edges.collect()], 34)


def test_adjacency_round_trip(spark):
    mat = [[0, 2, 0], [0, 0, 1], [1, 0, 0]]
    g = from_adjacency(spark, mat, directed=True)
    assert g.ecount() == 4  # 2 + 1 + 1 parallel edges
    sp = {(r.src, r.dst): r.value for r in get_adjacency(g).collect()}
    assert sp == {(0, 1): 2.0, (1, 2): 1.0, (2, 0): 1.0}


def test_adjacency_undirected_symmetric(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 1)], n=2, directed=False)
    sp = {(r.src, r.dst): r.value for r in get_adjacency(g).collect()}
    # symmetric off-diagonal; loop counts 2 on the diagonal
    assert sp == {(0, 1): 1.0, (1, 0): 1.0, (1, 1): 2.0}
