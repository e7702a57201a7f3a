"""Borůvka MST / spanning forest, bipartite maximum matching (via the
unit-capacity maxflow reduction), Laplacian, is_tree/is_forest."""

import pytest
from pyspark.sql import functions as F

from igraph_spark.algorithms.mst import (
    is_forest, is_tree, laplacian, minimum_spanning_tree)
from igraph_spark.generators import famous, ring
from igraph_spark.graph import Graph
from igraph_spark.operators.bipartite import maximum_bipartite_matching


def test_mst_weighted_unique(spark):
    # classic fixture: MST = {(0,1,1),(1,2,2),(0,3,3)}; (2,3,4),(0,2,5) out
    e = [(0, 1), (1, 2), (0, 3), (2, 3), (0, 2)]
    w = [1.0, 2.0, 3.0, 4.0, 5.0]
    g = Graph.from_edge_list(spark, e, n=4, directed=False, weights=w)
    mst = sorted((r.src, r.dst, r.weight)
                 for r in minimum_spanning_tree(g).collect())
    assert mst == [(0, 1, 1.0), (0, 3, 3.0), (1, 2, 2.0)]


def test_mst_is_spanning_forest_on_components(spark):
    # two components -> forest with n - 2 edges
    e = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5)]
    g = Graph.from_edge_list(spark, e, n=6, directed=False,
                             weights=[1, 2, 3, 1, 2, 3])
    mst = minimum_spanning_tree(g)
    assert mst.count() == 4
    assert sorted(r.weight for r in mst.collect()) == [1.0, 1.0, 2.0, 2.0]


def test_mst_karate_total_weight(spark):
    # deterministic hash weights; verify against in-driver Kruskal
    k = famous(spark, "Zachary")
    e = k.edges.select(
        "src", "dst",
        (F.pmod(F.xxhash64("src", "dst"), F.lit(97)) + 1)
        .cast("double").alias("weight"))
    g = Graph(e, k.vertices, directed=False)
    rows = [(r.src, r.dst, r.weight) for r in e.collect()]
    parent = list(range(34))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    total = 0.0
    for s, d, w in sorted(rows, key=lambda t: (t[2], t[0], t[1])):
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[rs] = rd
            total += w
    mst = minimum_spanning_tree(g)
    assert mst.count() == 33
    got = mst.agg(F.sum("weight")).first()[0]
    assert got == pytest.approx(total)


def test_is_tree_is_forest(spark):
    t = Graph.from_edge_list(spark, [(0, 1), (1, 2), (1, 3)], n=4,
                             directed=False)
    assert is_tree(t) and is_forest(t)
    r6 = ring(spark, 6)
    assert not is_tree(r6) and not is_forest(r6)
    f = Graph.from_edge_list(spark, [(0, 1), (2, 3)], n=4, directed=False)
    assert is_forest(f) and not is_tree(f)


def test_bipartite_matching_perfect_and_partial(spark):
    # C6 is bipartite with a perfect matching of size 3
    g = ring(spark, 6)
    types = spark.createDataFrame([(i, i % 2) for i in range(6)],
                                  "id long, type long")
    r = maximum_bipartite_matching(g, types)
    assert r["matching_size"] == 3
    m = r["matching"].collect()
    assert len({x.a for x in m}) == 3 and len({x.b for x in m}) == 3
    # star: hub side saturates at 1
    s = Graph.from_edge_list(spark, [(0, i) for i in (1, 2, 3)], n=4,
                             directed=False)
    st = spark.createDataFrame([(0, 0), (1, 1), (2, 1), (3, 1)],
                               "id long, type long")
    assert maximum_bipartite_matching(s, st)["matching_size"] == 1


def test_laplacian_row_sums_zero(spark):
    g = famous(spark, "bull")
    lap = laplacian(g)
    rs = (lap.groupBy("i").agg(F.sum("value").alias("s")).collect())
    assert all(abs(r.s) < 1e-12 for r in rs)
    nl = laplacian(g, normalized=True)
    diag = {r.i: r.value for r in nl.where("i = j").collect()}
    assert all(v == 1.0 for v in diag.values())
