"""Exact optimal modularity (optimal_modularity.c analog): the
branch-and-bound must match full partition enumeration, and known
published optima."""

import itertools
import math

import pytest

from igraph_spark.algorithms.lpa import modularity
from igraph_spark.algorithms.optimal import optimal_modularity
from igraph_spark.generators import famous
from igraph_spark.graph import Graph


def _labels(df):
    return {r["id"]: r["label"] for r in df.collect()}


def _brute_force_q(edges, n):
    """max modularity over ALL partitions of 0..n-1 (Bell-number scan)."""
    deg = [0.0] * n
    two_m = 0.0
    a = [[0.0] * n for _ in range(n)]
    for u, v in edges:
        a[u][v] += 1.0
        a[v][u] += 1.0
        deg[u] += 1.0
        deg[v] += 1.0
        two_m += 2.0

    def q_of(assign):
        q = 0.0
        for i in range(n):
            for j in range(n):
                if assign[i] == assign[j]:
                    q += a[i][j] - deg[i] * deg[j] / two_m
        return q / two_m

    best = -1.0

    def parts(i, assign, k):
        nonlocal best
        if i == n:
            best = max(best, q_of(assign))
            return
        for g in range(k):
            assign[i] = g
            parts(i + 1, assign, k)
        assign[i] = k
        parts(i + 1, assign, k + 1)
        assign[i] = -1

    parts(0, [-1] * n, 0)
    return best


@pytest.mark.parametrize("name,edges,n", [
    ("bull", [(0, 1), (0, 2), (1, 2), (1, 3), (2, 4)], 5),
    ("two_triangles",
     [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5), (2, 3)], 6),
    ("path7", [(i, i + 1) for i in range(6)], 7),
    ("star6", [(0, i) for i in range(1, 6)], 6),
    ("cycle8", [(i, (i + 1) % 8) for i in range(8)], 8),
])
def test_matches_brute_force(spark, name, edges, n):
    g = Graph(spark.createDataFrame(edges, "src long, dst long"),
              vertices=spark.range(n).toDF("id"), directed=False)
    mem = optimal_modularity(g)
    q = modularity(g, mem)
    assert math.isclose(q, _brute_force_q(edges, n), abs_tol=1e-12)


def test_two_cliques_exact_split(spark):
    e = [(i, j) for i, j in itertools.combinations(range(5), 2)]
    e += [(i + 5, j + 5) for i, j in itertools.combinations(range(5), 2)]
    e += [(4, 5)]
    g = Graph(spark.createDataFrame(e, "src long, dst long"),
              directed=False)
    lab = _labels(optimal_modularity(g))
    assert {lab[i] for i in range(5)} == {0}
    assert {lab[i] for i in range(5, 10)} == {1}


def test_weighted(spark):
    # heavy edge dominates: optimal groups {0,1} vs {2,3}
    e = [(0, 1, 10.0), (1, 2, 1.0), (2, 3, 10.0), (3, 0, 1.0)]
    g = Graph(spark.createDataFrame(e, "src long, dst long, weight double"),
              directed=False)
    lab = _labels(optimal_modularity(g))
    assert lab[0] == lab[1] and lab[2] == lab[3] and lab[0] != lab[2]


def test_size_guard(spark):
    g = famous(spark, "Zachary")
    with pytest.raises(ValueError):
        optimal_modularity(g)   # 34 vertices > default max_vertices
