"""MCS / is_chordal (decomposition.c analogs), transitive closure of a
DAG, vertex permutation."""

import itertools

import pytest

from igraph_spark.algorithms.decomposition import (
    is_chordal, maximum_cardinality_search)
from igraph_spark.generators import famous, full, tree
from igraph_spark.graph import Graph
from igraph_spark.operators.structure import (permute_vertices,
                                              transitive_closure_dag)


def _g(spark, edges, directed=False, n=None):
    vs = spark.range(n).toDF("id") if n else None
    return Graph(spark.createDataFrame(edges, "src long, dst long"),
                 vs, directed=directed)


def test_mcs_is_a_permutation(spark):
    g = famous(spark, "Zachary")
    rows = maximum_cardinality_search(g).collect()
    assert sorted(r["rank"] for r in rows) == list(range(34))
    assert {r["id"] for r in rows} == set(range(34))


def test_chordal_graphs(spark):
    # trees, complete graphs and k-trees are chordal
    assert is_chordal(tree(spark, 15, children=2)) is True
    assert is_chordal(full(spark, 6)) is True
    # triangle + pendant
    assert is_chordal(_g(spark, [(0, 1), (1, 2), (0, 2), (2, 3)])) is True


def test_non_chordal_cycles(spark):
    # C4, C5 have no chord
    c4 = _g(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    c5 = _g(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0)])
    assert is_chordal(c4) is False
    assert is_chordal(c5) is False
    # C4 plus one chord IS chordal
    assert is_chordal(_g(spark, [(0, 1), (1, 2), (2, 3), (3, 0),
                                 (0, 2)])) is True


def test_chordal_brute_force_small(spark):
    # compare against a brute-force PEO search on all 5-vertex graphs
    # with 6 edges from a fixed sample
    import random
    rng = random.Random(3)
    allp = list(itertools.combinations(range(5), 2))
    for _ in range(8):
        edges = rng.sample(allp, 6)
        nb = {i: set() for i in range(5)}
        for u, v in edges:
            nb[u].add(v)
            nb[v].add(u)

        def peo_exists(remaining, nbs):
            if not remaining:
                return True
            for v in list(remaining):
                later = nbs[v] & remaining
                if all(b in nbs[a] for a, b in
                       itertools.combinations(later, 2)):
                    return peo_exists(remaining - {v}, nbs)
            return False

        expect = peo_exists(set(range(5)), nb)
        got = is_chordal(_g(spark, edges, n=5))
        assert got == expect, edges


def test_transitive_closure_path(spark):
    g = _g(spark, [(0, 1), (1, 2), (2, 3)], directed=True)
    tc = transitive_closure_dag(g)
    got = sorted((r["src"], r["dst"]) for r in tc.edges.collect())
    assert got == [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]


def test_transitive_closure_rejects_cycle(spark):
    g = _g(spark, [(0, 1), (1, 0)], directed=True)
    with pytest.raises(ValueError, match="cycle"):
        transitive_closure_dag(g)


def test_permute_vertices(spark):
    g = _g(spark, [(0, 1), (1, 2)], directed=True, n=3)
    m = spark.createDataFrame([(0, 10), (1, 11), (2, 12)],
                              "id long, new_id long")
    p = permute_vertices(g, m)
    got = sorted((r["src"], r["dst"]) for r in p.edges.collect())
    assert got == [(10, 11), (11, 12)]
    assert {r["id"] for r in p.vertices.collect()} == {10, 11, 12}
