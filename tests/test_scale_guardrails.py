"""Scale guardrails (round 3): sampled-default betweenness/closeness
above a vcount threshold, iFUB diameter.  Exactness claims are tested
on structures where the estimators are provably exact."""

from pyspark.sql import functions as F

from igraph_spark import Graph, betweenness, closeness, diameter
from igraph_spark.algorithms.betweenness import sample_sources
from igraph_spark.generators import famous, ring


def test_sample_sources_deterministic_k(spark):
    g = ring(spark, 40)
    s1 = [r[0] for r in sample_sources(g, 7, seed=3).collect()]
    s2 = [r[0] for r in sample_sources(g, 7, seed=3).collect()]
    assert s1 == s2 and len(set(s1)) == 7
    assert all(0 <= x < 40 for x in s1)


def test_betweenness_auto_sample_exact_on_ring(spark):
    # ring is vertex-transitive: every source contributes the same total
    # dependency, so the n/k-extrapolated TOTAL equals the exact total
    g = ring(spark, 24)
    exact = betweenness(g)  # below threshold -> exact
    est = betweenness(g, auto_sample_threshold=10, sample_size=6, seed=1)
    tot_exact = exact.agg(F.sum("betweenness")).first()[0]
    tot_est = est.agg(F.sum("betweenness")).first()[0]
    assert abs(tot_exact - tot_est) < 1e-6
    # and the sampled run really used 6 sources: per-vertex values are
    # lumpy multiples of n/k, different from the flat exact profile
    vals = {r.betweenness for r in exact.collect()}
    assert len(vals) == 1  # transitive -> exact is flat


def test_closeness_pivot_exact_on_complete(spark):
    # K_n: all distances 1, so the pivot ratio k/k equals the exact
    # (n-1)/(n-1) for every vertex
    pairs = [(a, b) for a in range(12) for b in range(12) if a < b]
    g = Graph.from_edge_list(spark, pairs, n=12, directed=False)
    exact = {r.id: r.closeness for r in closeness(g).collect()}
    est = {r.id: r.closeness
           for r in closeness(g, auto_sample_threshold=5,
                              sample_size=4, seed=2).collect()}
    assert set(exact) == set(est)
    for k in exact:
        assert abs(exact[k] - est[k]) < 1e-12


def test_ifub_diameter_matches_exact(spark):
    g = ring(spark, 20)
    assert diameter(g, method="exact") == 10
    assert diameter(g, method="ifub") == 10
    z = famous(spark, "Zachary")
    assert diameter(z, method="ifub") == diameter(z, method="exact") == 5


def test_ifub_star_and_path(spark):
    star = Graph.from_edge_list(
        spark, [(0, i) for i in range(1, 9)], n=9, directed=False)
    assert diameter(star, method="ifub") == 2
    path = Graph.from_edge_list(
        spark, [(i, i + 1) for i in range(7)], n=8, directed=False)
    assert diameter(path, method="ifub") == 7
