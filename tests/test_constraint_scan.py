"""Burt constraint, centralization, scan-1
(structural_properties.c:2538, centrality.c:2800, scan.c:331)."""

import math

from igraph_spark.graph import Graph
from igraph_spark.algorithms.centrality import (
    centralization_degree, constraint)
from igraph_spark.operators.structure import local_scan_1


def test_constraint_star_golden(spark):
    # 4-star: center 1/3; leaves 1 + 2*(1/3)^2; isolate NaN
    g = Graph.from_edge_list(spark, [(0, 1), (0, 2), (0, 3)], n=5,
                             directed=False)
    c = {r.id: r.constraint for r in constraint(g).collect()}
    assert abs(c[0] - 1 / 3) < 1e-12
    for leaf in (1, 2, 3):
        assert abs(c[leaf] - (1 + 2 / 9)) < 1e-12
    assert math.isnan(c[4])


def test_constraint_complete_triangle(spark):
    # K3: p_ij = 1/2; c_i = 2 * (1/2 + 1/2*1/2)^2 = 2 * 9/16
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (0, 2)], n=3,
                             directed=False)
    c = {r.id: r.constraint for r in constraint(g).collect()}
    for v in (0, 1, 2):
        assert abs(c[v] - 2 * (0.75 ** 2)) < 1e-12


def test_centralization_star_is_one(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (0, 2), (0, 3)], n=4,
                             directed=False)
    assert abs(centralization_degree(g) - 1.0) < 1e-12


def test_centralization_ring_is_zero(spark):
    from igraph_spark.generators import ring
    g = ring(spark, 6)
    assert centralization_degree(g) == 0.0


def test_scan1_triangle_plus_pendant(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (0, 2), (0, 3)],
                             n=4, directed=False)
    s = {r.id: r.scan1 for r in local_scan_1(g).collect()}
    assert s == {0: 4, 1: 3, 2: 3, 3: 1}
