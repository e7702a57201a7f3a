"""Freeman centralization wrappers (centrality.c:3014-3190 analogs):
star = 1, complete = 0, karate betweenness centralization matches the
published igraph value."""

import pytest

from igraph_spark.algorithms.centrality import (
    centralization_betweenness, centralization_closeness,
    centralization_eigenvector)
from igraph_spark.generators import famous, full, star


def test_star_is_maximally_central(spark):
    s = star(spark, 10)
    assert centralization_betweenness(s) == pytest.approx(1.0)
    assert centralization_closeness(s) == pytest.approx(1.0)


def test_complete_graph_is_uncentralized(spark):
    k = full(spark, 5)
    assert centralization_betweenness(k) == pytest.approx(0.0)
    assert centralization_closeness(k) == pytest.approx(0.0)
    assert centralization_eigenvector(k) == pytest.approx(0.0, abs=1e-6)


def test_karate_betweenness_centralization(spark):
    # igraph's documented value for Zachary betweenness centralization
    g = famous(spark, "Zachary")
    assert centralization_betweenness(g) == pytest.approx(0.40556, abs=2e-4)


def test_star_eigenvector_scaled(spark):
    # scaled star: center 1, leaves 1/3 -> (10 - 4) / (n - 2) = 0.75
    s = star(spark, 10)
    assert centralization_eigenvector(s) == pytest.approx(0.75, abs=1e-6)


def test_assortativity_values_matches_degree(spark):
    # feeding degrees as values reproduces degree assortativity
    # (excess-degree shift is affine, Pearson r is shift-invariant)
    from pyspark.sql import functions as F
    from igraph_spark.operators.structure import (assortativity_degree,
                                                  assortativity_values)
    g = famous(spark, "Zachary")
    deg = g.degree().select("id", F.col("degree").alias("value"))
    assert assortativity_values(g, deg) == pytest.approx(
        assortativity_degree(g))
    assert assortativity_degree(g) == pytest.approx(-0.47561, abs=1e-4)


def test_assortativity_values_directed_two_vectors(spark):
    from igraph_spark.graph import Graph
    from igraph_spark.operators.structure import assortativity_values
    e = [(0, 1), (1, 2), (2, 3)]
    g = Graph(spark.createDataFrame(e, "src long, dst long"),
              directed=True)
    vals = spark.createDataFrame([(i, float(i)) for i in range(4)],
                                 "id long, value double")
    anti = spark.createDataFrame([(i, float(-i)) for i in range(4)],
                                 "id long, value double")
    assert assortativity_values(g, vals) == pytest.approx(1.0)
    assert assortativity_values(g, vals, anti) == pytest.approx(-1.0)
