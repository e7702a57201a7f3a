"""Component fixtures (FIXTURES.md §3.4): weak-label exactness vs the
igraph seed-scan semantics, SCC partition parity on the 2-SCC fixture.
"""

from pyspark.sql import functions as F

from igraph_spark.graph import Graph
from igraph_spark.algorithms.components import (
    connected_components, component_sizes, is_connected)
from igraph_spark.generators import famous

from tests.oracle import components_oracle

# ring(5) ∪ path(3) ∪ 2 isolated vertices, ids interleaved so label
# order is a real test of the min-id dense-rank semantics
MULTI = ([(0, 2), (2, 4), (4, 6), (6, 8), (8, 0)]   # ring on evens
         + [(1, 3), (3, 5)])                        # path on odds
MULTI_N = 12  # 9, 10, 11 isolated (and 7 isolated too)


def _labels(df, n):
    rows = {r["id"]: r["component"] for r in df.collect()}
    return [rows[i] for i in range(n)]


def test_weak_labels_exact(spark):
    g = Graph.from_edge_list(spark, MULTI, n=MULTI_N, directed=False)
    got = _labels(connected_components(g, "weak"), MULTI_N)
    want = components_oracle(MULTI_N, MULTI)
    assert got == want


def test_weak_sizes_in_label_order(spark):
    g = Graph.from_edge_list(spark, MULTI, n=MULTI_N, directed=False)
    sizes = [(r["component"], r["size"])
             for r in component_sizes(g, "weak").collect()]
    want = components_oracle(MULTI_N, MULTI)
    from collections import Counter
    cnt = Counter(want)
    assert sizes == sorted((c, s) for c, s in cnt.items())


def test_karate_one_component(spark):
    g = famous(spark, "Zachary")
    assert is_connected(g, "weak")
    labels = _labels(connected_components(g, "weak"), 34)
    assert labels == [0] * 34


def test_directed_weak_symmetrizes(spark):
    # weak components always use IGRAPH_ALL (components.c:133-134)
    g = Graph.from_edge_list(spark, [(0, 1), (2, 1)], n=3, directed=True)
    labels = _labels(connected_components(g, "weak"), 3)
    assert labels == [0, 0, 0]


def test_scc_two_components(spark):
    # cycle 0->1->2->0 plus 2->3, 3->4, 4->3 (FIXTURES.md §3.4)
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 3)]
    g = Graph.from_edge_list(spark, edges, n=5, directed=True)
    weak = _labels(connected_components(g, "weak"), 5)
    assert weak == [0] * 5
    strong = _labels(connected_components(g, "strong"), 5)
    # partition: {0,1,2} and {3,4}; canonical labels: min-id order
    assert strong == [0, 0, 0, 1, 1]


def test_scc_dag_all_singletons(spark):
    edges = [(0, 1), (1, 2), (0, 2), (2, 3)]
    g = Graph.from_edge_list(spark, edges, n=4, directed=True)
    strong = _labels(connected_components(g, "strong"), 4)
    assert strong == [0, 1, 2, 3]


def test_scc_mixed_chain_of_cycles(spark):
    # two cycles joined by a one-way bridge + a tail vertex
    edges = [(0, 1), (1, 0), (1, 2), (2, 3), (3, 2), (3, 4)]
    g = Graph.from_edge_list(spark, edges, n=5, directed=True)
    strong = _labels(connected_components(g, "strong"), 5)
    assert strong == [0, 0, 1, 1, 2]
