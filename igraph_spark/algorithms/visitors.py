"""BFS / DFS visitor orders — igraph_bfs / igraph_dfs
(/root/reference/src/visitors.c:40,468; fixture
examples/simple/igraph_bfs.c/.out).

A total visit order is inherently sequential — each step consumes the
frontier one vertex at a time — so no distributed formulation exists
that preserves the contract (the reference's own implementation is a
single queue/stack walk).  The Spark-side cost model is therefore the
same as the reference's: the edge list is collected ONCE into the
driver (gated by ``max_driver_edges``; a visit order over more rows
than that is output-bound anyway — callers who want distances at scale
use ``bfs_distances``/``delta_stepping``, which are BSP fixpoints),
the walk runs in Python over int arrays, and the order returns as a
DataFrame.

Determinism: the reference visits neighbors in edge-insertion
(adjacency list) order; a DataFrame edge set has no insertion order,
so this module canonicalizes to ascending neighbor id.  The two
reference fixtures (path ring, complete binary tree — generators that
emit edges in ascending order) are reproduced exactly under this
convention (test_visitors.py); for arbitrary edge orders the orders
may differ from the C library while satisfying the same BFS/DFS
invariants.
"""

from __future__ import annotations

from collections import deque

from pyspark.sql import DataFrame, functions as F

from igraph_spark.graph import Graph, SRC, DST

#: visit orders above this many edges refuse to collect to the driver
MAX_DRIVER_EDGES = 10_000_000


def _adjacency(graph: Graph, mode: str,
               max_driver_edges: int) -> dict[int, list[int]]:
    m = graph.ecount()
    if m > max_driver_edges:
        raise ValueError(
            f"visit order over {m} edges exceeds max_driver_edges="
            f"{max_driver_edges}; a total visit order is sequential by "
            "definition — use bfs_distances/delta_stepping for "
            "distances at scale, or raise the gate explicitly")
    e = graph.edges.select(SRC, DST).where(F.col(SRC) != F.col(DST))
    if mode == "all" or not graph.directed:
        e = e.unionByName(e.select(F.col(DST).alias(SRC),
                                   F.col(SRC).alias(DST)))
    elif mode == "in":
        e = e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
    elif mode != "out":
        raise ValueError("mode must be 'out', 'in' or 'all'")
    adj: dict[int, list[int]] = {}
    for r in e.distinct().collect():
        adj.setdefault(int(r[SRC]), []).append(int(r[DST]))
        adj.setdefault(int(r[DST]), [])
    for v in adj:
        adj[v].sort()
    return adj


def bfs_order(graph: Graph, root: int, mode: str = "all",
              all_components: bool = False,
              max_driver_edges: int = MAX_DRIVER_EDGES) -> DataFrame:
    """igraph_bfs (visitors.c:40) -> DataFrame(order, id, parent,
    dist): the breadth-first visit order from ``root``, parent = the
    discovering (first-reached, min-order) neighbor, null for roots.
    ``all_components`` mirrors the reference's ``unreachable`` flag:
    restart at the smallest unvisited vertex id until all are seen."""
    spark = graph.edges.sparkSession
    adj = _adjacency(graph, mode, max_driver_edges)
    for r in graph.vertices.collect():
        adj.setdefault(int(r[0]), [])
    if root not in adj:
        raise ValueError(f"root {root} is not a vertex")
    seen = {root}
    rows = []
    q = deque([(root, None, 0)])
    while True:
        while q:
            v, parent, d = q.popleft()
            rows.append((len(rows), v, parent, d))
            for w in adj[v]:
                if w not in seen:
                    seen.add(w)
                    q.append((w, v, d + 1))
        if not all_components or len(seen) == len(adj):
            break
        nxt = min(v for v in adj if v not in seen)
        seen.add(nxt)
        q.append((nxt, None, 0))
    return spark.createDataFrame(
        rows, "order long, id long, parent long, dist long")


def dfs_order(graph: Graph, root: int, mode: str = "all",
              all_components: bool = False,
              max_driver_edges: int = MAX_DRIVER_EDGES) -> DataFrame:
    """igraph_dfs (visitors.c:468) -> DataFrame(order, id, parent,
    order_out): depth-first preorder rank, discovering parent (null
    for roots) and postorder rank (``order_out``), neighbors explored
    in ascending id order."""
    spark = graph.edges.sparkSession
    adj = _adjacency(graph, mode, max_driver_edges)
    for r in graph.vertices.collect():
        adj.setdefault(int(r[0]), [])
    if root not in adj:
        raise ValueError(f"root {root} is not a vertex")
    seen = set()
    pre: dict[int, tuple[int, int | None]] = {}
    post: dict[int, int] = {}
    roots = [root]
    if all_components:
        roots += sorted(v for v in adj if v != root)
    for r0 in roots:
        if r0 in seen:
            continue
        seen.add(r0)
        # iterative DFS with an explicit per-vertex neighbor cursor so
        # pre/post orders match the reference's recursive walk
        stack: list[tuple[int, int | None, int]] = [(r0, None, 0)]
        while stack:
            v, parent, i = stack.pop()
            if i == 0:
                pre[v] = (len(pre), parent)
            ns = adj[v]
            while i < len(ns) and ns[i] in seen:
                i += 1
            if i == len(ns):
                post[v] = len(post)
                continue
            w = ns[i]
            seen.add(w)
            stack.append((v, parent, i + 1))
            stack.append((w, v, 0))
    rows = [(o, v, parent, post[v])
            for v, (o, parent) in sorted(pre.items(), key=lambda kv: kv[1])]
    return spark.createDataFrame(
        rows, "order long, id long, parent long, order_out long")
