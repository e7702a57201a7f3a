"""Delta-stepping SSSP (round 3): same distances as Bellman-Ford on
non-negative weights, with frontier-bounded relaxation work."""

import pytest

from igraph_spark import Graph, delta_stepping, shortest_paths


def _star_plus_tail(spark, leaves=60, tail=25):
    # hub 0 with `leaves` weight-1 spokes plus one thin path of `tail`
    # hops: BF relaxes the FULL state every round for ~tail rounds;
    # delta-stepping's frontier collapses to the path after bucket 1
    edges, w = [], []
    for i in range(1, leaves + 1):
        edges.append((0, i)); w.append(1.0)
    prev = 0
    base = leaves + 1
    for j in range(tail):
        edges.append((prev, base + j)); w.append(1.0)
        prev = base + j
    n = base + tail
    return Graph.from_edge_list(spark, edges, n=n, directed=True,
                                weights=w), n


def test_delta_matches_bellman_ford(spark):
    g, n = _star_plus_tail(spark, leaves=15, tail=8)
    bf = {(r.source, r.id): r.dist
          for r in shortest_paths(g, [0]).collect()}
    ds = {(r.source, r.id): r.dist
          for r in delta_stepping(g, [0]).collect()}
    assert bf == ds
    assert len(ds) == n  # everything reachable from the hub


def test_delta_mixed_weights(spark):
    # light/heavy split actually exercised: mean weight ~2.6 so the
    # 5.0 edges are heavy; shortest path to 3 goes the light way
    edges = [(0, 1), (1, 2), (2, 3), (0, 3), (1, 3)]
    w = [1.0, 1.0, 1.0, 5.0, 5.0]
    g = Graph.from_edge_list(spark, edges, n=4, directed=True, weights=w)
    ds = {r.id: r.dist for r in delta_stepping(g, [0]).collect()}
    assert ds == {0: 0.0, 1: 1.0, 2: 2.0, 3: 3.0}


def test_delta_frontier_work_bounded(spark):
    g, n = _star_plus_tail(spark, leaves=60, tail=12)
    stats = {}
    delta_stepping(g, [0], stats=stats)
    # BF would relax the full ~73-row state for ~13 rounds (~950 row-
    # rounds); delta-stepping's cumulative frontier is the initial wave
    # plus one or two rows per tail bucket
    assert stats["frontier_rows"] < 3 * n
    assert stats["rounds"] >= 12


def test_delta_rejects_negative(spark):
    g = Graph.from_edge_list(spark, [(0, 1)], n=2, directed=True,
                             weights=[-1.0])
    with pytest.raises(ValueError):
        delta_stepping(g, [0])
