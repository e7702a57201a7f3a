"""All-cliques enumeration + clique_number (cliques.c:327) and the
discrete-time SIR analog (sir.c)."""

from pyspark.sql import functions as F

from igraph_spark.algorithms.cliques import clique_number, cliques
from igraph_spark.algorithms.epidemics import sir
from igraph_spark.generators import famous, path, ring


def test_cliques_bull(spark):
    g = famous(spark, "bull")
    out = cliques(g)
    sizes = {r["size"]: 0 for r in out.collect()}
    for r in out.collect():
        sizes[r["size"]] = sizes.get(r["size"], 0) + 1
    # bull: 5 singletons, 5 edges, 1 triangle, no K4
    assert sizes == {1: 5, 2: 5, 3: 1}
    assert out.count() == 11


def test_cliques_size_window(spark):
    g = famous(spark, "Zachary")
    tri = cliques(g, min_size=3, max_size=3)
    assert tri.count() == 45  # = karate triangle count
    assert clique_number(g) == 5


def test_sir_full_spread_beta1(spark):
    g = path(spark, 5)  # 0-1-2-3-4
    out = sir(g, beta=1.0, gamma=0.0, seed=1).orderBy("step").collect()
    # wave moves one hop per step from vertex 0 (both directions n/a)
    assert [(r.s, r.i, r.r) for r in out] == [
        (4, 1, 0), (3, 2, 0), (2, 3, 0), (1, 4, 0), (0, 5, 0)]


def test_sir_no_spread_beta0(spark):
    g = ring(spark, 6)
    out = sir(g, beta=0.0, gamma=1.0, seed=2).orderBy("step").collect()
    assert [(r.s, r.i, r.r) for r in out] == [(5, 1, 0), (5, 0, 1)]


def test_sir_conservation_and_determinism(spark):
    g = famous(spark, "Zachary")
    a = sir(g, beta=0.4, gamma=0.3, seed=7).collect()
    b = sir(g, beta=0.4, gamma=0.3, seed=7).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    n = 34
    rs = -1
    for r in sorted(a):
        assert r.s + r.i + r.r == n
        assert r.r >= rs  # recovered is monotone
        rs = r.r
    assert sorted(a)[-1][3] > 0  # someone recovered by the end
