"""Vertex/edge connectivity + minimum s-t vertex cuts (flow.c family:
igraph_vertex_connectivity / igraph_st_edge_connectivity /
igraph_st_vertex_connectivity analogs) on textbook fixtures."""

import pytest

from igraph_spark.algorithms.flow import (
    edge_connectivity, min_st_vertex_cut, vertex_connectivity)
from igraph_spark.generators import full, ring
from igraph_spark.graph import Graph

PETERSEN = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (0, 5), (1, 6),
            (2, 7), (3, 8), (4, 9), (5, 7), (7, 9), (9, 6), (6, 8), (8, 5)]


def test_ring_connectivity(spark):
    g = ring(spark, 6)
    assert vertex_connectivity(g) == 2.0
    assert edge_connectivity(g) == 2.0


def test_petersen_is_3_connected(spark):
    g = Graph.from_edge_list(spark, PETERSEN, n=10, directed=False)
    assert vertex_connectivity(g) == 3.0
    assert edge_connectivity(g) == 3.0


def test_complete_graph_convention(spark):
    g = full(spark, 5)
    assert vertex_connectivity(g) == 4.0  # igraph: kappa(K_n) = n-1
    assert edge_connectivity(g) == 4.0


def test_bowtie_cut_vertex(spark):
    # two triangles sharing vertex 2
    e = [(0, 1), (0, 2), (1, 2), (2, 3), (2, 4), (3, 4)]
    g = Graph.from_edge_list(spark, e, n=5, directed=False)
    assert vertex_connectivity(g) == 1.0
    r = min_st_vertex_cut(g, 0, 4)
    assert r["value"] == 1.0 and r["separator"] == [2]


def test_st_variants_and_adjacent_raises(spark):
    g = ring(spark, 6)
    assert vertex_connectivity(g, 0, 3) == 2.0
    assert edge_connectivity(g, 0, 3) == 2.0
    with pytest.raises(ValueError):
        min_st_vertex_cut(g, 0, 1)


def test_directed_edge_connectivity(spark):
    g = ring(spark, 5, directed=True)  # one-way cycle
    assert edge_connectivity(g) == 1.0
    assert edge_connectivity(g, 0, 3) == 1.0


def test_disconnected_zero(spark):
    e = [(0, 1), (2, 3)]
    g = Graph.from_edge_list(spark, e, n=4, directed=False)
    assert vertex_connectivity(g) == 0.0
    assert edge_connectivity(g) == 0.0
