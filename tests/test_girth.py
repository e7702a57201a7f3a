"""Girth (structural_properties.c:3762) — known-value fixtures."""

from igraph_spark.graph import Graph
from igraph_spark.generators import famous, ring, tree
from igraph_spark.algorithms.paths import girth


def test_rings(spark):
    assert girth(ring(spark, 6)) == 6
    assert girth(ring(spark, 7)) == 7


def test_forest_has_no_girth(spark):
    assert girth(tree(spark, 15)) is None


def test_karate_girth_three(spark):
    assert girth(famous(spark, "Zachary")) == 3


def test_petersen_girth_five(spark):
    pet = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (0, 5), (1, 6),
           (2, 7), (3, 8), (4, 9), (5, 7), (7, 9), (9, 6), (6, 8), (8, 5)]
    g = Graph.from_edge_list(spark, pet, n=10, directed=False)
    assert girth(g) == 5


def test_loop_and_multi_edge_conventions(spark):
    assert girth(Graph.from_edge_list(spark, [(0, 0), (0, 1)], n=2,
                                      directed=True)) == 1
    assert girth(Graph.from_edge_list(spark, [(0, 1), (0, 1), (1, 2)],
                                      n=3, directed=True)) == 2
