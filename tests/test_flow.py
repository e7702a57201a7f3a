"""Maxflow / mincut (flow.c:470,1615) — the reference's own
igraph_mincut fixture plus structural hand cases."""

from igraph_spark.graph import Graph
from igraph_spark.algorithms.flow import maxflow, mincut


def test_reference_mincut_fixture(spark):
    # igraph_mincut.c / .out: weighted undirected 8-vertex graph;
    # golden: value 4, partitions {2,3,6,7}/{0,1,4,5}, cut 1-2(3), 5-6(1)
    edges = [(0, 1), (0, 4), (1, 2), (1, 4), (1, 5), (2, 3), (2, 6),
             (3, 6), (3, 7), (4, 5), (5, 6), (6, 7)]
    w = [2.0, 3.0, 3.0, 2.0, 2.0, 4.0, 2.0, 2.0, 2.0, 3.0, 1.0, 3.0]
    g = Graph.from_edge_list(spark, edges, n=8, directed=False, weights=w)
    r = mincut(g)
    assert r["value"] == 4.0
    assert sorted(x.id for x in r["partition"].where("side=0").collect()) \
        == [0, 1, 4, 5]
    assert sorted((x.src, x.dst, x.cap) for x in r["cut"].collect()) \
        == [(1, 2, 3.0), (5, 6, 1.0)]


def test_unit_diamond_flow_two(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (0, 2), (1, 3), (2, 3)],
                             n=4, directed=True)
    r = maxflow(g, 0, 3)
    assert r["value"] == 2.0
    # flow conservation at the interior vertices
    f = {(x.src, x.dst): x.f for x in r["flow"].collect()}
    assert f[(0, 1)] == f[(1, 3)] and f[(0, 2)] == f[(2, 3)]


def test_bottleneck_path(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2)], n=3, directed=True,
                             weights=[5.0, 1.0])
    r = maxflow(g, 0, 2)
    assert r["value"] == 1.0
    assert [(x.src, x.dst, x.cap) for x in r["cut"].collect()] \
        == [(1, 2, 1.0)]


def test_disconnected_zero_flow(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (2, 3)], n=4, directed=True)
    r = maxflow(g, 0, 3)
    assert r["value"] == 0.0
    assert r["cut"].count() == 0


def test_gomory_hu_tree_pairwise_cuts(spark):
    # barbell: two triangles joined by one bridge — within-triangle
    # mincut 2, cross-bridge mincut 1; the GH tree must encode both
    from igraph_spark.algorithms.flow import gomory_hu_tree
    import collections
    edges = [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5), (2, 3)]
    g = Graph.from_edge_list(spark, edges, n=6, directed=False)
    tree = [(r.src, r.dst, r.flow) for r in gomory_hu_tree(g).collect()]
    adj = collections.defaultdict(list)
    for u, v, f in tree:
        adj[u].append((v, f))
        adj[v].append((u, f))

    def tree_mincut(u, v):
        seen = {u: float("inf")}
        stack = [u]
        while stack:
            x = stack.pop()
            for y, f in adj[x]:
                if y not in seen:
                    seen[y] = min(seen[x], f)
                    stack.append(y)
        return seen[v]

    for u, v, expected in [(0, 1, 2.0), (3, 5, 2.0), (0, 5, 1.0),
                           (1, 4, 1.0)]:
        assert tree_mincut(u, v) == expected
        assert maxflow(g, u, v)["value"] == expected


def test_needs_residual_back_edge(spark):
    # classic trap: the greedy path 0-1-2-3 must be partially undone
    # via the residual back edge to reach flow 2
    edges = [(0, 1), (1, 2), (2, 3), (0, 2), (1, 3)]
    g = Graph.from_edge_list(spark, edges, n=4, directed=True)
    assert maxflow(g, 0, 3)["value"] == 2.0


def test_mincut_sw_equals_probe_loop(spark):
    """The Stoer-Wagner path (default for undirected) and the maxflow
    probe loop (forced via driver_threshold=-1) must agree on value on
    weighted and unweighted graphs, including a disconnected one."""
    cases = [
        # reference fixture graph
        ([(0, 1), (0, 4), (1, 2), (1, 4), (1, 5), (2, 3), (2, 6),
          (3, 6), (3, 7), (4, 5), (5, 6), (6, 7)],
         [2.0, 3.0, 3.0, 2.0, 2.0, 4.0, 2.0, 2.0, 2.0, 3.0, 1.0, 3.0], 8),
        # barbell (unweighted): bridge mincut 1
        ([(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5), (2, 3)],
         None, 6),
        # disconnected: mincut 0
        ([(0, 1), (2, 3)], None, 4),
    ]
    for edges, w, n in cases:
        g = Graph.from_edge_list(spark, edges, n=n, directed=False,
                                 weights=w)
        sw = mincut(g)
        probe = mincut(g, driver_threshold=-1)
        assert sw["value"] == probe["value"], (edges, w)
        # the SW partition must actually realize the value
        side0 = {x.id for x in sw["partition"].where("side=0").collect()}
        ww = w or [1.0] * len(edges)
        crossing = sum(cw for (u, v), cw in zip(edges, ww)
                       if (u in side0) != (v in side0))
        assert crossing == sw["value"]


def test_mincut_sw_random_vs_bruteforce(spark):
    """Deterministic pseudo-random weighted graph: SW value == brute
    force over all 2^(n-1) bipartitions."""
    import itertools
    n = 9
    edges, w = [], []
    for u in range(n):
        for v in range(u + 1, n):
            h = (u * 31 + v * 17) % 7
            if h < 4:
                edges.append((u, v))
                w.append(float(1 + (u * 13 + v * 5) % 6))
    g = Graph.from_edge_list(spark, edges, n=n, directed=False, weights=w)
    r = mincut(g)
    best = float("inf")
    for mask in range(1, 1 << (n - 1)):   # vertex 0 fixed on side A
        side = {0} | {v for v in range(1, n) if mask & (1 << (v - 1))}
        if len(side) == n:
            continue
        cost = sum(cw for (u, v), cw in zip(edges, w)
                   if (u in side) != (v in side))
        best = min(best, cost)
    assert r["value"] == best


def test_mincut_isolated_vertex_short_circuit(spark):
    """A graph with an isolated vertex has a value-0 mincut that must
    be found WITHOUT collecting the vertex set to the driver (the
    sparse-edges/many-vertices case the SW driver gate alone misses).
    Exercised here at small n; the short-circuit path is the same plan
    shape at any vcount."""
    # triangle + isolated vertex 3; vertex 5 also isolated
    edges = [(0, 1), (1, 2), (2, 0), (4, 4)]   # 4 has only a self-loop
    g = Graph.from_edge_list(spark, edges, n=6, directed=False)
    r = mincut(g)
    assert r["value"] == 0.0
    part = {x.id: x.side for x in r["partition"].collect()}
    assert set(part) == set(range(6))
    # side 0 holds the minimum vertex id (vertex 0 here, which is NOT
    # isolated, so the singleton isolated side is side 1)
    assert part[0] == 0
    sides = set(part.values())
    assert sides == {0, 1}
    # the singleton side is one isolated vertex (min-id isolated = 3)
    singleton = [v for v, s in part.items() if s == 1]
    assert singleton == [3]
    assert r["cut"].count() == 0

    # isolated vertex IS the min id -> it sits alone on side 0
    g2 = Graph.from_edge_list(spark, [(1, 2), (2, 3)], n=4, directed=False)
    r2 = mincut(g2)
    assert r2["value"] == 0.0
    part2 = {x.id: x.side for x in r2["partition"].collect()}
    assert part2[0] == 0
    assert [v for v, s in part2.items() if s == 0] == [0]


def test_gomory_hu_batched_forced_distributed(spark):
    """Speculatively-batched Gusfield at driver_threshold=0 (every
    probe runs the distributed Edmonds-Karp) must produce the
    bit-identical tree of the sequential batch_size=1 loop, and the
    tree must encode all pairwise mincuts."""
    from igraph_spark.algorithms.flow import gomory_hu_tree
    import collections
    # weighted barbell + a chord so parents actually get reassigned
    edges = [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5), (2, 3),
             (1, 4)]
    w = [1.0, 2.0, 1.0, 2.0, 1.0, 1.0, 1.0, 1.0]
    g = Graph.from_edge_list(spark, edges, n=6, directed=False, weights=w)
    seq = sorted((r.src, r.dst, r.flow)
                 for r in gomory_hu_tree(g, batch_size=1,
                                         driver_threshold=0).collect())
    bat = sorted((r.src, r.dst, r.flow)
                 for r in gomory_hu_tree(g, batch_size=4,
                                         driver_threshold=0).collect())
    assert bat == seq, "batched Gusfield must replay the sequential tree"

    adj = collections.defaultdict(list)
    for u, v, f in bat:
        adj[u].append((v, f))
        adj[v].append((u, f))

    def tree_mincut(u, v):
        seen = {u: float("inf")}
        stack = [u]
        while stack:
            x = stack.pop()
            for y, f in adj[x]:
                if y not in seen:
                    seen[y] = min(seen[x], f)
                    stack.append(y)
        return seen[v]

    for u in range(6):
        for v in range(u + 1, 6):
            assert tree_mincut(u, v) == maxflow(g, u, v)["value"], (u, v)
