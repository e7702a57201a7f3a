"""Graphlet decomposition (reference src/glet.c): basis recursion,
same-threshold filtering, EM projection fixpoint."""

import math

import pytest

from igraph_spark.graph import Graph
from igraph_spark.algorithms.graphlets import (graphlets,
                                               graphlets_candidate_basis,
                                               graphlets_project)


def _g(spark, rows, n=None):
    e = spark.createDataFrame(rows, "src long, dst long, weight double")
    v = spark.range(n) if n else None
    return Graph(e, v, directed=False)


def _basis_set(df):
    return {(tuple(r.clique), r.threshold) for r in df.collect()}


def test_two_disjoint_weight_cliques(spark):
    rows = [(0, 1, 2.0), (0, 2, 2.0), (1, 2, 2.0),
            (2, 3, 1.0), (2, 4, 1.0), (3, 4, 1.0)]
    basis = graphlets_candidate_basis(_g(spark, rows))
    assert _basis_set(basis) == {((0, 1, 2), 2.0), ((2, 3, 4), 1.0)}


def test_nested_thresholds_recurse(spark):
    # K4 at weight 1 with the {0,1,2} triangle upgraded to weight 2:
    # basis = the K4 at thr 1 plus the inner triangle at thr 2
    rows = [(0, 1, 2.0), (0, 2, 2.0), (1, 2, 2.0),
            (0, 3, 1.0), (1, 3, 1.0), (2, 3, 1.0)]
    basis = graphlets_candidate_basis(_g(spark, rows))
    assert _basis_set(basis) == {((0, 1, 2, 3), 1.0), ((0, 1, 2), 2.0)}


def test_isolated_vertex_inf_threshold(spark):
    rows = [(0, 1, 1.0)]
    basis = graphlets_candidate_basis(_g(spark, rows, n=3))
    got = _basis_set(basis)
    assert ((0, 1), 1.0) in got
    assert any(cl == (2,) and math.isinf(thr) for cl, thr in got)


def test_uniform_weights_single_clique(spark):
    rows = [(0, 1, 3.0), (0, 2, 3.0), (1, 2, 3.0)]
    basis = graphlets_candidate_basis(_g(spark, rows))
    # no recursion when all internal weights are equal
    assert _basis_set(basis) == {((0, 1, 2), 3.0)}


def test_projection_fixpoint_single_clique(spark):
    # K3, w=1: fixpoint of mu *= (sum w/(eps+mu)) / (n(n+1)/2) solves
    # 3/(eps+mu) = 6  ->  mu = 0.5 - eps
    rows = [(0, 1, 1.0), (0, 2, 1.0), (1, 2, 1.0)]
    g = _g(spark, rows)
    basis = graphlets_candidate_basis(g)
    out = graphlets_project(g, basis, niter=200)
    mu = out.collect()[0].mu
    assert abs(mu - (0.5 - 0.0001)) < 1e-6


def test_graphlets_orders_heavier_first(spark):
    rows = [(0, 1, 5.0), (0, 2, 5.0), (1, 2, 5.0),
            (3, 4, 1.0), (3, 5, 1.0), (4, 5, 1.0)]
    out = graphlets(_g(spark, rows), niter=100).collect()
    assert [tuple(r.clique) for r in out] == [(0, 1, 2), (3, 4, 5)]
    assert out[0].mu > out[1].mu > 0


def test_requires_weights(spark):
    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError, match="weighted"):
        graphlets_candidate_basis(Graph(e, directed=False))


def test_project_custom_start_mu(spark):
    rows = [(0, 1, 1.0), (0, 2, 1.0), (1, 2, 1.0)]
    g = _g(spark, rows)
    basis = graphlets_candidate_basis(g)
    out = graphlets_project(g, basis, niter=0, start_mu=[7.0])
    assert out.collect()[0].mu == 7.0
