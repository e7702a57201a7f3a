"""Walktrap communities (walktrap.cpp analog): exact recovery on
planted structures, modularity quality on karate, weighted pull, and
the Louvain-contract hybrid path."""

import collections
import itertools

from igraph_spark.algorithms.lpa import modularity
from igraph_spark.algorithms.walktrap import walktrap_communities
from igraph_spark.generators import famous
from igraph_spark.graph import Graph


def _labels(df):
    return {r["id"]: r["label"] for r in df.collect()}


def _clique_pair_edges():
    e = [(i, j) for i, j in itertools.combinations(range(5), 2)]
    e += [(i + 5, j + 5) for i, j in itertools.combinations(range(5), 2)]
    e += [(4, 5)]
    return e


def test_two_cliques_split_exactly(spark):
    g = Graph(spark.createDataFrame(_clique_pair_edges(),
                                    "src long, dst long"), directed=False)
    lab = _labels(walktrap_communities(g))
    assert {lab[i] for i in range(5)} == {0}
    assert {lab[i] for i in range(5, 10)} == {1}


def test_ring_of_cliques(spark):
    # 4 x K4 in a ring -> 4 communities, one per clique
    e = []
    for c in range(4):
        base = 4 * c
        e += [(base + i, base + j)
              for i, j in itertools.combinations(range(4), 2)]
        e.append((base + 3, (base + 4) % 16))
    g = Graph(spark.createDataFrame(e, "src long, dst long"),
              directed=False)
    lab = _labels(walktrap_communities(g))
    assert len(set(lab.values())) == 4
    for c in range(4):
        assert len({lab[4 * c + i] for i in range(4)}) == 1


def test_karate_quality_and_determinism(spark):
    g = famous(spark, "Zachary")
    m1 = walktrap_communities(g)
    lab = _labels(m1)
    sizes = sorted(collections.Counter(lab.values()).values())
    assert 2 <= len(sizes) <= 6
    q = modularity(g, m1)
    assert q > 0.35
    assert _labels(walktrap_communities(g)) == lab  # deterministic


def test_weighted_edges_pull_membership(spark):
    # two heavy triangles bridged by light edges: the walk stays inside
    # a triangle, so the triangles are the communities
    e = [(0, 1, 10.0), (1, 2, 10.0), (0, 2, 10.0),
         (3, 4, 10.0), (4, 5, 10.0), (3, 5, 10.0),
         (2, 3, 0.1), (5, 0, 0.1)]
    g = Graph(spark.createDataFrame(
        e, "src long, dst long, weight double"), directed=False)
    lab = _labels(walktrap_communities(g))
    assert lab[0] == lab[1] == lab[2]
    assert lab[3] == lab[4] == lab[5]
    assert lab[0] != lab[3]


def test_isolated_vertices_stay_singletons(spark):
    g = Graph(spark.createDataFrame([(0, 1)], "src long, dst long"),
              spark.createDataFrame([(0,), (1,), (7,)], "id long"),
              directed=False)
    lab = _labels(walktrap_communities(g))
    assert lab[0] == lab[1] != lab[7]


def test_hybrid_coarse_path(spark):
    g = Graph(spark.createDataFrame(_clique_pair_edges(),
                                    "src long, dst long"), directed=False)
    lab = _labels(walktrap_communities(g, vertex_threshold=4))
    assert lab[0] == lab[4] and lab[5] == lab[9]
    assert len(set(lab.values())) == 2
