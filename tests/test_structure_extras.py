"""famous() catalog, nominal assortativity, diversity, neighborhood /
ego, radius (mixing.c + structural_properties.c analogs)."""

import math

import pytest
from pyspark.sql import functions as F

from igraph_spark.generators import famous, FAMOUS
from igraph_spark.graph import Graph
from igraph_spark.operators.structure import (
    assortativity_nominal, diversity, neighborhood, neighborhood_size,
    radius)


def test_famous_catalog_shapes(spark):
    for name, (n, edges) in FAMOUS.items():
        g = famous(spark, name)
        assert g.vcount() == n, name
        assert g.ecount() == len(edges), name


def test_famous_petersen_is_3_regular(spark):
    g = famous(spark, "Petersen")
    degs = [r["degree"] for r in g.degree().collect()]
    assert degs == [3] * 10


def test_assortativity_nominal_perfect_and_anti(spark):
    # two cliques of one type each, one cross edge -> near 1
    e = [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5), (2, 3)]
    g = Graph.from_edge_list(spark, e, n=6, directed=False)
    types = spark.createDataFrame(
        [(i, i // 3) for i in range(6)], "id long, type long")
    r = assortativity_nominal(g, types)
    # e_ii = 6/7; a=b=[3.5/7, 3.5/7] -> ab=0.5; (6/7-0.5)/0.5
    assert r == pytest.approx((6 / 7 - 0.5) / 0.5, abs=1e-12)
    # complete bipartite between types -> -1
    kb = Graph.from_edge_list(
        spark, [(0, 2), (0, 3), (1, 2), (1, 3)], n=4, directed=False)
    tb = spark.createDataFrame([(0, 0), (1, 0), (2, 1), (3, 1)],
                               "id long, type long")
    assert assortativity_nominal(kb, tb) == pytest.approx(-1.0, abs=1e-12)


def test_diversity_conventions(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (0, 2), (3, 4)], n=6,
                             directed=False, weights=[1.0, 1.0, 2.0])
    d = {r["id"]: r["diversity"] for r in diversity(g).collect()}
    assert d[0] == pytest.approx(1.0)     # two equal weights: H/log2 = 1
    assert d[1] == 0.0 and d[3] == 0.0    # degree 1 -> 0
    assert math.isnan(d[5])               # isolated -> NaN
    # skewed weights -> entropy < 1
    g2 = Graph.from_edge_list(spark, [(0, 1), (0, 2)], n=3,
                              directed=False, weights=[9.0, 1.0])
    d2 = {r["id"]: r["diversity"] for r in diversity(g2).collect()}
    p = [0.9, 0.1]
    want = -sum(x * math.log(x) for x in p) / math.log(2)
    assert d2[0] == pytest.approx(want, abs=1e-12)


def test_neighborhood_and_ego(spark):
    g = famous(spark, "Petersen")
    nb1 = neighborhood(g, 1)
    sizes = {r["id"]: r["size"]
             for r in neighborhood_size(g, 1).collect()}
    assert all(v == 4 for v in sizes.values())  # self + 3 neighbors
    ring2 = neighborhood(g, 2, mindist=2)
    # Petersen: diameter 2, 3-regular, so exactly 10-4=6 at distance 2
    cnt = {r["id"]: r["c"] for r in
           ring2.groupBy("id").agg(F.count("*").alias("c")).collect()}
    assert all(v == 6 for v in cnt.values())


def test_radius(spark):
    g = famous(spark, "Petersen")
    assert radius(g, mode="all") == 2.0
    star = Graph.from_edge_list(
        spark, [(0, i) for i in range(1, 6)], n=6, directed=False)
    assert radius(star, mode="all") == 1.0


def test_full_citation(spark):
    from igraph_spark.generators import full_citation
    g = full_citation(spark, 4)
    assert g.directed
    assert sorted((r.src, r.dst) for r in g.edges.collect()) == \
        [(1, 0), (2, 0), (2, 1), (3, 0), (3, 1), (3, 2)]


def test_preference_game_types_and_determinism(spark):
    from igraph_spark.generators import preference_game
    g = preference_game(spark, 60, 3, [0.5, 0.25, 0.25],
                        [[0.8, 0.05, 0.05], [0.05, 0.8, 0.05],
                         [0.05, 0.05, 0.8]], seed=5)
    types = {r.id: r.type for r in g.vertices.collect()}
    counts = [sum(1 for t in types.values() if t == k) for k in range(3)]
    assert counts == [30, 15, 15]
    from pyspark.sql import functions as F2
    e = g.edges
    tt = (e.join(g.vertices.select(F2.col("id").alias("src"),
                                   F2.col("type").alias("ta")), "src")
          .join(g.vertices.select(F2.col("id").alias("dst"),
                                  F2.col("type").alias("tb")), "dst"))
    same = tt.where("ta = tb").count()
    diff = tt.where("ta != tb").count()
    assert same > diff  # assortative preference dominates
    g2 = preference_game(spark, 60, 3, [0.5, 0.25, 0.25],
                         [[0.8, 0.05, 0.05], [0.05, 0.8, 0.05],
                          [0.05, 0.05, 0.8]], seed=5)
    assert sorted(map(tuple, g.edges.collect())) == \
        sorted(map(tuple, g2.edges.collect()))


def test_islands_game(spark):
    from igraph_spark.generators import islands
    from igraph_spark.algorithms.components import connected_components
    g = islands(spark, 3, 8, 0.9, 2, seed=3)
    assert g.vcount() == 24
    ncomp = (connected_components(g, "weak")
             .select("component").distinct().count())
    assert ncomp == 1  # inter edges connect the dense islands
    # exactly n_inter edges between each island pair
    from pyspark.sql import functions as F2
    inter = g.edges.where(
        (F2.col("src") / 8).cast("long") != (F2.col("dst") / 8).cast("long"))
    assert inter.count() == 2 * 3  # 3 island pairs x 2


def test_flow_aliases(spark):
    from igraph_spark.algorithms.flow import (
        adhesion, cohesion, edge_disjoint_paths, vertex_disjoint_paths)
    from igraph_spark.generators import famous
    p = famous(spark, "petersen")
    assert adhesion(p) == 3.0 and cohesion(p) == 3.0
    assert edge_disjoint_paths(p, 0, 7) == 3
    assert vertex_disjoint_paths(p, 0, 7) == 3


def test_write_leda(spark, tmp_path):
    import os
    from igraph_spark.graph import Graph
    from igraph_spark.sources.readers import write_leda
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2)], n=3, directed=True)
    p = os.path.join(str(tmp_path), "g.leda")
    write_leda(g, None, p)
    txt = open(p).read().splitlines()
    assert txt[0] == "LEDA.GRAPH" and txt[3] == "-1" and txt[4] == "3"
    assert txt[-1] == "2 3 0 |{}|"
