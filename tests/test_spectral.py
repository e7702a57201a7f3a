"""Leading-eigenvector communities (community.c:1512, Newman 2006)
vs the reference's own karate fixture
(igraph_community_leading_eigenvector.out)."""

from pyspark.sql import functions as F

from igraph_spark.algorithms.lpa import modularity
from igraph_spark.algorithms.spectral import leading_eigenvector_communities
from igraph_spark.generators import famous
from igraph_spark.graph import Graph

# reference output for steps=1 on karate (first bisection)
KARATE_SPLIT1 = [0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 0, 0, 0, 0, 1, 1, 0, 0,
                 1, 0, 1, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1]


def _partition(rows):
    groups = {}
    for r in rows:
        groups.setdefault(r["label"], set()).add(r["id"])
    return {frozenset(g) for g in groups.values()}


def test_karate_first_bisection_matches_reference(spark):
    k = famous(spark, "Zachary")
    m = leading_eigenvector_communities(k, steps=1).collect()
    want = {frozenset(i for i, l in enumerate(KARATE_SPLIT1) if l == 0),
            frozenset(i for i, l in enumerate(KARATE_SPLIT1) if l == 1)}
    assert _partition(m) == want


def test_karate_three_splits_quality(spark):
    # the reference's full run lands 4 communities at Q ~= 0.39; three
    # accepted splits bound the suite's runtime while checking the
    # recursion + stopping rule end-to-end
    k = famous(spark, "Zachary")
    mem = leading_eigenvector_communities(k, steps=3, max_power_iter=80)
    labels = mem.withColumnRenamed("label", "community")
    q = modularity(k, labels)
    assert q > 0.3
    ncomm = mem.select("label").distinct().count()
    assert 2 <= ncomm <= 4


def test_two_cliques_split(spark):
    # two K4s joined by one edge: the first split separates them
    e = ([(i, j) for i in range(4) for j in range(i + 1, 4)]
         + [(4 + i, 4 + j) for i in range(4) for j in range(i + 1, 4)]
         + [(3, 4)])
    g = Graph.from_edge_list(spark, e, n=8, directed=False)
    m = leading_eigenvector_communities(g, steps=1).collect()
    assert _partition(m) == {frozenset(range(4)), frozenset(range(4, 8))}


def test_indivisible_complete_graph(spark):
    from igraph_spark.generators import full
    g = full(spark, 6)
    m = leading_eigenvector_communities(g).collect()
    assert len(_partition(m)) == 1  # K6 has no positive-eigenvalue split


def test_distributed_path_karate_bisection(spark):
    # force the BSP power-iteration path (driver_threshold=0) and check
    # it agrees with the reference fixture like the driver path does
    k = famous(spark, "Zachary")
    m = leading_eigenvector_communities(k, steps=1,
                                        driver_threshold=0).collect()
    want = {frozenset(i for i, l in enumerate(KARATE_SPLIT1) if l == 0),
            frozenset(i for i, l in enumerate(KARATE_SPLIT1) if l == 1)}
    assert _partition(m) == want


def test_driver_full_run_fast_and_good(spark):
    # the full (uncapped) run is now in-driver below the threshold:
    # should land the reference's ~4 communities at Q ~ 0.39
    k = famous(spark, "Zachary")
    mem = leading_eigenvector_communities(k)
    labels = mem.withColumnRenamed("label", "community")
    assert modularity(k, labels) > 0.35
    ncomm = mem.select("label").distinct().count()
    assert 3 <= ncomm <= 5
