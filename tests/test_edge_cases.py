"""Degenerate-input behavior of the round-2 operators: edgeless
graphs, loop-only graphs, unreachable sources — no crashes, sane
results."""

import math

from igraph_spark.graph import Graph


def _edgeless(spark, n=4):
    return Graph.from_edge_list(spark, [], n=n, directed=False)


def test_articulation_and_blocks_edgeless(spark):
    from igraph_spark.algorithms.biconnected import (
        articulation_points, biconnected_components)
    g = _edgeless(spark)
    assert articulation_points(g).count() == 0
    assert biconnected_components(g).count() == 0


def test_maximal_cliques_edgeless_all_singletons(spark):
    from igraph_spark.algorithms.cliques import maximal_cliques
    got = sorted(tuple(r.clique)
                 for r in maximal_cliques(_edgeless(spark)).collect())
    assert got == [(0,), (1,), (2,), (3,)]


def test_edge_betweenness_and_gn_edgeless(spark):
    from igraph_spark.algorithms.betweenness import (
        edge_betweenness, girvan_newman)
    g = _edgeless(spark)
    assert edge_betweenness(g).count() == 0
    labels = {r.id: r.label for r in girvan_newman(g, 2).collect()}
    assert len(set(labels.values())) == 4  # every vertex its own comp


def test_constraint_edgeless_all_nan(spark):
    from igraph_spark.algorithms.centrality import constraint
    for r in constraint(_edgeless(spark)).collect():
        assert math.isnan(r.constraint)


def test_shortest_paths_isolated_source(spark):
    from igraph_spark.algorithms.paths import get_shortest_paths
    rows = get_shortest_paths(_edgeless(spark), [0]).collect()
    assert [(r.source, r.id, r.dist, list(r.path))
            for r in rows] == [(0, 0, 0, [0])]


def test_triad_census_loop_only(spark):
    from igraph_spark.algorithms.motifs import triad_census
    g = Graph.from_edge_list(spark, [(0, 0)], n=1, directed=True)
    assert triad_census(g).where("count != 0").count() == 0
