"""CSR block kernel vs JVM join kernel: identical PageRank results
(north rule's per-partition CSR blocks, igraph_spark/plans/csr.py)."""

import numpy as np

from igraph_spark.graph import Graph
from igraph_spark.algorithms.pagerank import pagerank
from igraph_spark.generators import famous

from tests.test_pagerank import PR4, PR9W_EDGES, PR9W_W, _scores


def test_csr_matches_join_karate(spark):
    g = famous(spark, "Zachary")
    a = _scores(pagerank(g, tol=1e-8, max_iter=120, kernel="join"), 34)
    b = _scores(pagerank(g, tol=1e-8, max_iter=120, kernel="csr",
                         num_partitions=4), 34)
    assert np.allclose(a, b, atol=1e-9)


def test_csr_matches_join_weighted(spark):
    g = Graph.from_edge_list(spark, PR9W_EDGES, n=9, directed=True,
                             weights=PR9W_W)
    a = _scores(pagerank(g, weights=True, tol=1e-8, kernel="join"), 9)
    b = _scores(pagerank(g, weights=True, tol=1e-8, kernel="csr",
                         num_partitions=3), 9)
    assert np.allclose(a, b, atol=1e-9)


def test_csr_dangling(spark):
    g = Graph.from_edge_list(spark, PR4, n=4, directed=True)
    a = _scores(pagerank(g, tol=1e-8, kernel="join"), 4)
    b = _scores(pagerank(g, tol=1e-8, kernel="csr", num_partitions=2), 4)
    assert np.allclose(a, b, atol=1e-9)
