"""Whole-graph isomorphism + automorphism counts over the VF2 analog
(igraph_isomorphic / count_subisomorphisms(g, g))."""

import pytest

from igraph_spark.algorithms.isomorphism import (count_automorphisms,
                                                 is_isomorphic)
from igraph_spark.generators import famous, full
from igraph_spark.graph import Graph


def _g(spark, edges, directed=False, n=None):
    vs = spark.range(n).toDF("id") if n else None
    return Graph(spark.createDataFrame(edges, "src long, dst long"),
                 vs, directed=directed)


def test_relabel_isomorphic(spark):
    g1 = _g(spark, [(0, 1), (1, 2), (2, 3)])
    g2 = _g(spark, [(7, 5), (5, 9), (9, 8)])
    assert is_isomorphic(g1, g2) is True


def test_same_degree_sequence_not_isomorphic(spark):
    # C6 vs two triangles: both 2-regular on 6 vertices
    c6 = _g(spark, [(i, (i + 1) % 6) for i in range(6)])
    tt = _g(spark, [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3)])
    assert is_isomorphic(c6, tt) is False


def test_directedness_matters(spark):
    c3 = _g(spark, [(0, 1), (1, 2), (2, 0)], directed=True)
    r3 = _g(spark, [(0, 1), (1, 2), (0, 2)], directed=True)
    assert is_isomorphic(c3, r3) is False
    assert is_isomorphic(c3, _g(spark, [(5, 3), (3, 4), (4, 5)],
                                directed=True)) is True


def test_isolated_vertices_counted(spark):
    g1 = _g(spark, [(0, 1)], n=3)
    g2 = _g(spark, [(1, 2)], n=3)
    g3 = _g(spark, [(0, 1)], n=4)
    assert is_isomorphic(g1, g2) is True
    assert is_isomorphic(g1, g3) is False


def test_automorphism_counts(spark):
    assert count_automorphisms(full(spark, 4)) == 24
    # path on 3 vertices: identity + reflection
    assert count_automorphisms(_g(spark, [(0, 1), (1, 2)])) == 2
    # an isolated vertex multiplies by its interchange factor
    assert count_automorphisms(_g(spark, [(0, 1), (1, 2)], n=5)) == 4


def test_petersen_automorphisms(spark):
    assert count_automorphisms(famous(spark, "Petersen")) == 120


def test_gate(spark):
    g = full(spark, 13)
    with pytest.raises(ValueError, match="gated"):
        is_isomorphic(g, g)
