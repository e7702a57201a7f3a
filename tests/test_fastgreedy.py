"""Fast-greedy CNM communities (fast_community.c) — reference-known
karate result plus structural cases and the hybrid coarse path."""

from igraph_spark import Graph, fastgreedy_communities, modularity
from igraph_spark.generators import famous, full


def _partition(rows):
    groups = {}
    for r in rows:
        groups.setdefault(r["label"], set()).add(r["id"])
    return {frozenset(g) for g in groups.values()}


def test_karate_cnm_reference_quality(spark):
    # igraph fastgreedy on karate: 3 communities, max Q ~= 0.3807
    k = famous(spark, "Zachary")
    mem = fastgreedy_communities(k)
    q = modularity(k, mem.withColumnRenamed("label", "community"))
    assert abs(q - 0.3807) < 0.002
    assert mem.select("label").distinct().count() == 3


def test_two_cliques(spark):
    e = ([(i, j) for i in range(4) for j in range(i + 1, 4)]
         + [(4 + i, 4 + j) for i in range(4) for j in range(i + 1, 4)]
         + [(3, 4)])
    g = Graph.from_edge_list(spark, e, n=8, directed=False)
    m = fastgreedy_communities(g).collect()
    assert _partition(m) == {frozenset(range(4)), frozenset(range(4, 8))}


def test_complete_graph_single_community(spark):
    g = full(spark, 6)
    m = fastgreedy_communities(g).collect()
    assert len(_partition(m)) == 1


def test_isolated_vertices_are_singletons(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (0, 2)], n=5,
                             directed=False)
    m = {r.id: r.label for r in fastgreedy_communities(g).collect()}
    assert m[0] == m[1] == m[2]
    assert len({m[3], m[4], m[0]}) == 3


def test_hybrid_coarse_path_matches(spark):
    # force the Louvain-contract-then-CNM path with a tiny threshold;
    # on well-separated cliques it must find the same partition
    e = ([(i, j) for i in range(5) for j in range(i + 1, 5)]
         + [(5 + i, 5 + j) for i in range(5) for j in range(i + 1, 5)]
         + [(4, 5)])
    g = Graph.from_edge_list(spark, e, n=10, directed=False)
    m = fastgreedy_communities(g, driver_threshold=3).collect()
    assert _partition(m) == {frozenset(range(5)), frozenset(range(5, 10))}
