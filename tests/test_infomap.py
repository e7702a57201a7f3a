"""Infomap communities (infomap.cc analog): planted-structure
recovery, karate codelength vs the published two-level optimum,
driver-vs-distributed map-equation agreement, and the hybrid path."""

import collections
import itertools
import math

import pytest

from igraph_spark.algorithms.infomap import (
    infomap_communities,
    infomap_codelength,
    map_equation,
)
from igraph_spark.algorithms.lpa import modularity
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
    lab = _labels(infomap_communities(g))
    assert {lab[i] for i in range(5)} == {0}
    assert {lab[i] for i in range(5, 10)} == {1}


def test_ring_of_cliques(spark):
    e = []
    for c in range(4):
        base = 4 * c
        e += [(base + i, base + j)
              for i, j in itertools.combinations(range(4), 2)]
        e.append((base + 3, (base + 4) % 16))
    g = Graph(spark.createDataFrame(e, "src long, dst long"),
              directed=False)
    lab = _labels(infomap_communities(g))
    assert len(set(lab.values())) == 4
    for c in range(4):
        assert len({lab[4 * c + i] for i in range(4)}) == 1


def test_karate_codelength_and_quality(spark):
    # canonical two-level infomap result on Zachary under igraph's
    # teleport flow model (alpha 0.15): 3 modules sized 5/11/18 at
    # ~4.606 bits (the often-quoted 4.311 is the teleport-FREE flow
    # of the standalone Infomap binary, a different model)
    g = famous(spark, "Zachary")
    mem = infomap_communities(g)
    bits = infomap_codelength(g, mem)
    assert bits < 4.62
    lab = _labels(mem)
    k = len(set(lab.values()))
    assert k == 3
    assert sorted(collections.Counter(lab.values()).values()) == [5, 11, 18]
    assert modularity(g, mem) > 0.3
    # deterministic across calls
    assert _labels(infomap_communities(g)) == lab


def test_codelength_prefers_good_partition(spark):
    g = Graph(spark.createDataFrame(_clique_pair_edges(),
                                    "src long, dst long"), directed=False)
    spark_ = g.edges.sparkSession
    good = spark_.createDataFrame(
        [(i, 0 if i < 5 else 1) for i in range(10)], "id long, label long")
    bad = spark_.createDataFrame(
        [(i, i % 2) for i in range(10)], "id long, label long")
    one = spark_.createDataFrame(
        [(i, 0) for i in range(10)], "id long, label long")
    lg, lb, l1 = (infomap_codelength(g, m) for m in (good, bad, one))
    assert lg < l1 < lb


def test_distributed_map_equation_matches_driver(spark):
    g = famous(spark, "Zachary")
    mem = infomap_communities(g)
    bits_driver = infomap_codelength(g, mem)
    bits_dist = map_equation(g, mem, iters=300)
    assert math.isclose(bits_driver, bits_dist, rel_tol=1e-5)
    # and on the trivial one-module partition
    one = spark.createDataFrame([(i, 0) for i in range(34)],
                                "id long, label long")
    assert math.isclose(infomap_codelength(g, one),
                        map_equation(g, one, iters=300), rel_tol=1e-5)


def test_directed_flow(spark):
    # directed 3-cycle pair bridged one-way: modules = the two cycles
    e = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)]
    g = Graph(spark.createDataFrame(e, "src long, dst long"),
              directed=True)
    lab = _labels(infomap_communities(g))
    assert len({lab[0], lab[1], lab[2]}) == 1
    assert len({lab[3], lab[4], lab[5]}) == 1
    assert lab[0] != lab[3]


def test_weighted_pull(spark):
    # path 0-1-2-3 with a heavy middle edge: the strong tie holds 1,2
    # together in one module
    e = [(0, 1, 1.0), (1, 2, 10.0), (2, 3, 1.0)]
    g = Graph(spark.createDataFrame(e, "src long, dst long, weight double"),
              directed=False)
    lab = _labels(infomap_communities(g))
    assert lab[1] == lab[2]


def test_hybrid_path_matches_planted(spark):
    g = Graph(spark.createDataFrame(_clique_pair_edges(),
                                    "src long, dst long"), directed=False)
    lab = _labels(infomap_communities(g, vertex_threshold=0))
    assert {lab[i] for i in range(5)} == {0}
    assert {lab[i] for i in range(5, 10)} == {1}


def test_isolates_and_empty(spark):
    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    g = Graph(e, vertices=spark.range(4).toDF("id"), directed=False)
    lab = _labels(infomap_communities(g))
    assert len(lab) == 4
    assert lab[0] == lab[1]
    empty = Graph(spark.createDataFrame([], "src long, dst long"),
                  vertices=spark.range(0).toDF("id"), directed=False)
    assert infomap_communities(empty).count() == 0
