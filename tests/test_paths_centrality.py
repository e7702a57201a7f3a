"""Paths, distances, eigenvector/HITS centrality, random walks,
dyad census — vs closed-form or brute-force oracles."""

import math

import numpy as np
import pytest

from igraph_spark.graph import Graph
from igraph_spark.algorithms import paths as P
from igraph_spark.algorithms.centrality import (
    eigenvector_centrality, hits, dyad_census)
from igraph_spark.generators import famous, ring, star, path as path_gen


def test_bfs_distances_ring(spark):
    g = ring(spark, 6, directed=False)
    d = {(r["source"], r["id"]): r["dist"]
         for r in P.bfs_distances(g, [0]).collect()}
    assert d == {(0, 0): 0, (0, 1): 1, (0, 5): 1, (0, 2): 2,
                 (0, 4): 2, (0, 3): 3}


def test_bfs_multi_source(spark):
    g = path_gen(spark, 5, directed=False)
    d = P.bfs_distances(g, [0, 4])
    got = {(r["source"], r["id"]): r["dist"] for r in d.collect()}
    assert got[(0, 4)] == 4 and got[(4, 0)] == 4 and got[(0, 2)] == 2


def test_bfs_directed_unreachable(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2)], n=3, directed=True)
    got = {(r["source"], r["id"]): r["dist"]
           for r in P.bfs_distances(g, [2], mode="out").collect()}
    assert got == {(2, 2): 0}          # nothing reachable from 2


def test_weighted_shortest_paths(spark):
    # 0->1 (1), 1->2 (1), 0->2 (5): shortest 0->2 is 2 via 1
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (0, 2)], n=3,
                             directed=True, weights=[1.0, 1.0, 5.0])
    got = {(r["source"], r["id"]): r["dist"]
           for r in P.shortest_paths(g, [0], weights=True).collect()}
    assert got[(0, 2)] == 2.0
    assert got[(0, 1)] == 1.0


def test_diameter_avg_path(spark):
    g = path_gen(spark, 5, directed=False)
    assert P.diameter(g) == 4
    # sum of pairwise distances on a path of 5: known closed form
    total = sum(abs(i - j) for i in range(5) for j in range(5) if i != j)
    pairs = 5 * 4
    assert abs(P.average_path_length(g) - total / pairs) < 1e-12


def test_eccentricity_closeness_star(spark):
    g = star(spark, 5, mode="undirected")   # center 0
    ecc = {r["id"]: r["ecc"] for r in P.eccentricity(g).collect()}
    assert ecc[0] == 1 and all(ecc[i] == 2 for i in range(1, 5))
    clo = {r["id"]: r["closeness"] for r in P.closeness(g, "all").collect()}
    assert clo[0] == pytest.approx(4 / 4)      # 4 at distance 1
    assert clo[1] == pytest.approx(4 / 7)      # 1 + 3*2


def test_eigenvector_star(spark):
    # undirected star: center score 1, leaves 1/sqrt(k)
    g = star(spark, 5, mode="undirected")
    got = {r["id"]: r["eigenvector"]
           for r in eigenvector_centrality(g, tol=1e-12).collect()}
    assert got[0] == pytest.approx(1.0)
    for i in range(1, 5):
        assert got[i] == pytest.approx(1 / math.sqrt(4), abs=1e-6)


def test_eigenvector_karate_matches_numpy(spark):
    g = famous(spark, "Zachary")
    got = {r["id"]: r["eigenvector"]
           for r in eigenvector_centrality(g, tol=1e-12,
                                           max_iter=500).collect()}
    from igraph_spark.generators import KARATE_EDGES
    A = np.zeros((34, 34))
    for u, v in KARATE_EDGES:
        A[u, v] = A[v, u] = 1
    vals, vecs = np.linalg.eigh(A)
    lead = np.abs(vecs[:, np.argmax(vals)])
    lead = lead / lead.max()
    for i in range(34):
        assert got[i] == pytest.approx(lead[i], abs=1e-5)


def test_hits_bipartite(spark):
    # hubs 0,1 point to authorities 2,3; 0 points to both
    g = Graph.from_edge_list(spark, [(0, 2), (0, 3), (1, 2)], n=4,
                             directed=True)
    got = {r["id"]: (r["hub"], r["authority"])
           for r in hits(g, tol=1e-12).collect()}
    assert got[0][0] == pytest.approx(1.0)          # strongest hub
    assert got[2][1] == pytest.approx(1.0)          # strongest authority
    assert got[0][0] > got[1][0]
    assert got[2][1] > got[3][1]
    assert got[2][0] == 0.0 and got[0][1] == 0.0


def test_random_walks(spark):
    g = ring(spark, 8, directed=True)
    w = P.random_walks(g, num_walks_per_vertex=1, length=5, seed=7)
    rows = w.collect()
    assert len(rows) == 8 * 5          # no sinks on a directed ring
    # on a directed ring the only neighbor is id+1: walks are forced
    by_walk = {}
    for r in rows:
        by_walk.setdefault(r["walk_id"], {})[r["step"]] = r["id"]
    for wid, steps in by_walk.items():
        for s in range(1, 5):
            assert steps[s] == (steps[s - 1] + 1) % 8
    # determinism
    w2 = P.random_walks(g, num_walks_per_vertex=1, length=5, seed=7)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, w2.collect()))


def test_dyad_census(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 0), (1, 2)], n=3,
                             directed=True)
    row = dyad_census(g).first()
    assert (row["mut"], row["asym"], row["null"]) == (1, 1, 1)
