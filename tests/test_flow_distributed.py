"""The distributed (>DRIVER_FLOW_ARCS) maxflow path, forced via
driver_threshold=0: DataFrame BFS parent fixpoint, path-only collects,
join-maintained flow (round-3 rewrite — VERDICT r2 #3).  Same fixtures
as the in-driver Dinic path must stay green."""

from igraph_spark.graph import Graph
from igraph_spark.algorithms.flow import maxflow


def test_distributed_reference_fixture(spark):
    # igraph_mincut.c golden graph as an s-t problem: maxflow(0,7)
    edges = [(0, 1), (0, 4), (1, 2), (1, 4), (1, 5), (2, 3), (2, 6),
             (3, 6), (3, 7), (4, 5), (5, 6), (6, 7)]
    w = [2.0, 3.0, 3.0, 2.0, 2.0, 4.0, 2.0, 2.0, 2.0, 3.0, 1.0, 3.0]
    g = Graph.from_edge_list(spark, edges, n=8, directed=False, weights=w)
    ref = maxflow(g, 0, 7)                       # in-driver Dinic
    dist = maxflow(g, 0, 7, driver_threshold=0)  # distributed EK
    assert abs(ref["value"] - dist["value"]) < 1e-9
    # cut capacity == flow value (max-flow/min-cut)
    cut_cap = sum(x.cap for x in dist["cut"].collect())
    assert abs(cut_cap - dist["value"]) < 1e-9
    # partition sides are consistent with the cut
    sides = {x.id: x.side for x in dist["partition"].collect()}
    assert sides[0] == 0 and sides[7] == 1
    for x in dist["cut"].collect():
        assert sides[x.src] == 0 and sides[x.dst] == 1


def test_distributed_diamond_and_conservation(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (0, 2), (1, 3), (2, 3)],
                             n=4, directed=True)
    r = maxflow(g, 0, 3, driver_threshold=0)
    assert r["value"] == 2.0
    f = {(x.src, x.dst): x.f for x in r["flow"].collect()}
    assert f[(0, 1)] == f[(1, 3)] and f[(0, 2)] == f[(2, 3)]


def test_distributed_backedge_cancellation(spark):
    # classic cancellation case: the first shortest path uses the
    # middle edge, a later augmentation must push flow back across it
    edges = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)]
    w = [1.0, 1.0, 1.0, 1.0, 1.0]
    g = Graph.from_edge_list(spark, edges, n=4, directed=True, weights=w)
    r = maxflow(g, 0, 3, driver_threshold=0)
    assert r["value"] == 2.0


def test_distributed_disconnected_zero(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (2, 3)], n=4, directed=True)
    r = maxflow(g, 0, 3, driver_threshold=0)
    assert r["value"] == 0.0
    sides = {x.id: x.side for x in r["partition"].collect()}
    assert sides[0] == 0 and sides[3] == 1
