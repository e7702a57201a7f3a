"""Graph layer: degree/strength loop conventions
(type_indexededgelist.c:935-1010 — FIXTURES.md §3.5), simplify,
direction conversions, subgraphs, set ops, structure measures."""

import math

from pyspark.sql import functions as F

from igraph_spark.graph import Graph
from igraph_spark.operators import setops, structure, similarity
from igraph_spark.algorithms.kcore import coreness
from igraph_spark.generators import famous, ring, star, full


def _col(df, key, val):
    return {r[key]: r[val] for r in df.collect()}


# ---------------------------------------------------------------- degrees
def test_degree_loop_semantics_directed(spark):
    # loop 0-0 plus edge 0-1: ALL degree of 0 is 3 with loops, 1 without
    g = Graph.from_edge_list(spark, [(0, 0), (0, 1)], n=2, directed=True)
    d_all = _col(g.degree("all", loops=True), "id", "degree")
    assert d_all == {0: 3, 1: 1}
    d_all_nl = _col(g.degree("all", loops=False), "id", "degree")
    assert d_all_nl == {0: 1, 1: 1}
    d_out = _col(g.degree("out", loops=True), "id", "degree")
    assert d_out == {0: 2, 1: 0}
    d_in = _col(g.degree("in", loops=True), "id", "degree")
    assert d_in == {0: 1, 1: 1}


def test_degree_isolated_zero(spark):
    g = Graph.from_edge_list(spark, [(0, 1)], n=4, directed=False)
    d = _col(g.degree(), "id", "degree")
    assert d == {0: 1, 1: 1, 2: 0, 3: 0}


def test_strength_weighted(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (0, 2), (1, 2)], n=3,
                             directed=True, weights=[2.0, 3.0, 5.0])
    s_out = _col(g.strength("out"), "id", "strength")
    assert s_out == {0: 5.0, 1: 5.0, 2: 0.0}
    s_all = _col(g.strength("all"), "id", "strength")
    assert s_all == {0: 5.0, 1: 7.0, 2: 8.0}


# ---------------------------------------------------------------- simplify
def test_simplify_collapses_multi_and_loops(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (0, 1), (0, 1), (2, 2)],
                             n=3, directed=True,
                             weights=[1.0, 2.0, 3.0, 9.0])
    s = g.simplify()
    rows = s.edges.collect()
    assert len(rows) == 1
    assert rows[0]["weight"] == 6.0     # default combiner: sum


def test_to_undirected_collapse(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 0), (1, 2)], n=3,
                             directed=True)
    u = g.to_undirected("collapse")
    assert not u.directed
    assert sorted((r["src"], r["dst"]) for r in u.edges.collect()) == \
        [(0, 1), (1, 2)]


def test_to_undirected_mutual(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 0), (1, 2)], n=3,
                             directed=True)
    u = g.to_undirected("mutual")
    assert [(r["src"], r["dst"]) for r in u.edges.collect()] == [(0, 1)]


def test_to_directed_mutual(spark):
    g = ring(spark, 4, directed=False)
    d = g.to_directed("mutual")
    assert d.ecount() == 8


# ---------------------------------------------------------------- subgraph
def test_induced_subgraph(spark):
    g = famous(spark, "Zachary")
    sub = g.induced_subgraph([0, 1, 2, 3])
    pairs = sorted((r["src"], r["dst"]) for r in sub.edges.collect())
    assert pairs == [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]


# ---------------------------------------------------------------- set ops
def test_setops(spark):
    g1 = Graph.from_edge_list(spark, [(0, 1), (1, 2)], n=3, directed=True)
    g2 = Graph.from_edge_list(spark, [(1, 2), (2, 3)], n=4, directed=True)
    assert setops.union(g1, g2).ecount() == 4          # multiset
    assert setops.intersection(g1, g2).ecount() == 1
    assert setops.difference(g1, g2).ecount() == 1
    dj = setops.disjoint_union(g1, g2)
    assert dj.ecount() == 4 and dj.vcount() == 7
    comp = setops.compose(g1, g2)                       # 0->1->2 => 0->2 etc.
    pairs = sorted((r["src"], r["dst"]) for r in comp.edges.collect())
    assert pairs == [(0, 2), (1, 3)]
    cpl = setops.complementer(
        Graph.from_edge_list(spark, [(0, 1)], n=3, directed=False))
    assert sorted((r["src"], r["dst"]) for r in cpl.edges.collect()) == \
        [(0, 2), (1, 2)]


# ---------------------------------------------------------------- structure
def test_density_reciprocity(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 0), (1, 2)], n=3,
                             directed=True)
    assert abs(structure.density(g) - 3 / 6) < 1e-12
    assert abs(structure.reciprocity(g) - 2 / 3) < 1e-12


def test_predicates(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (0, 1), (2, 2)], n=3,
                             directed=True)
    assert not structure.is_simple(g)
    assert structure.has_loops(g)
    m = _col(structure.count_multiple(g), "src", "multiplicity")
    assert m[0] == 2
    simple = g.simplify()
    assert structure.is_simple(simple)


def test_is_dag_and_topo(spark):
    dag = Graph.from_edge_list(spark, [(0, 1), (1, 2), (0, 2)], n=3,
                               directed=True)
    assert structure.is_dag(dag)
    layers = _col(structure.topological_order(dag), "id", "layer")
    assert layers[0] < layers[1] < layers[2]
    cyc = Graph.from_edge_list(spark, [(0, 1), (1, 0)], n=2, directed=True)
    assert not structure.is_dag(cyc)


def test_get_stochastic(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (0, 2)], n=3, directed=True,
                             weights=[1.0, 3.0])
    probs = {(r["src"], r["dst"]): r["prob"]
             for r in structure.get_stochastic(g).collect()}
    assert abs(probs[(0, 1)] - 0.25) < 1e-12
    assert abs(probs[(0, 2)] - 0.75) < 1e-12


def test_path_length_hist_ring5(spark):
    g = ring(spark, 5, directed=False)
    hist = {r["dist"]: r["count"] for r in
            structure.path_length_hist(g).collect()}
    assert hist == {1: 5, 2: 5}


# ---------------------------------------------------------------- similarity
def test_cocitation(spark):
    # 0->2, 1->2: 0 and 1 co-cite 2... cocitation counts common IN-nbrs:
    # pairs of vertices cited by the same vertex
    g = Graph.from_edge_list(spark, [(0, 1), (0, 2), (3, 1), (3, 2)],
                             n=4, directed=True)
    cc = {(r["a"], r["b"]): r["common"]
          for r in similarity.cocitation(g).collect()}
    assert cc[(1, 2)] == 2


def test_jaccard(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (0, 2), (3, 1), (3, 2),
                                     (0, 4)], n=5, directed=False)
    jac = {(r["a"], r["b"]): r["jaccard"]
           for r in similarity.similarity_jaccard(g).collect()}
    # N(0)={1,2,4}, N(3)={1,2} => J = 2/3
    assert abs(jac[(0, 3)] - 2 / 3) < 1e-12


# ---------------------------------------------------------------- k-core
def test_coreness(spark):
    # triangle + tail: triangle vertices are 2-core, tail is 1-core
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 0), (2, 3)],
                             n=4, directed=False)
    c = _col(coreness(g), "id", "coreness")
    assert c == {0: 2, 1: 2, 2: 2, 3: 1}


def test_coreness_karate_max4(spark):
    g = famous(spark, "Zachary")
    c = _col(coreness(g), "id", "coreness")
    assert max(c.values()) == 4         # public known result for karate
    assert min(c.values()) == 1
