"""Maximum cardinality search and chordality —
igraph_maximum_cardinality_search / igraph_is_chordal
(/root/reference/src/decomposition.c:56,252).

MCS is a sequential greedy order (each step picks the unvisited
vertex with the most visited neighbors), so it runs in-driver over a
collected adjacency gated by the visitor-family edge cap.  The
chordality CHECK over the produced order is fully distributed: the
Tarjan-Yannakakis criterion — for every vertex, its earlier-ranked
neighbors minus the latest-ranked one ("the parent") must all be
adjacent to that parent — is two joins and an anti-join over the edge
table, O(m) state, no driver loops.
"""

from __future__ import annotations

import heapq

from pyspark.sql import DataFrame, functions as F

from igraph_spark.graph import Graph, ID, SRC, DST
from igraph_spark.algorithms.visitors import MAX_DRIVER_EDGES, _adjacency


def maximum_cardinality_search(
        graph: Graph, root: int | None = None,
        max_driver_edges: int = MAX_DRIVER_EDGES) -> DataFrame:
    """igraph_maximum_cardinality_search -> DataFrame(id, rank):
    visit ranks 0..n-1; ties broken toward the smallest vertex id
    (the reference follows adjacency order — see visitors.py on the
    canonicalization).  Disconnected graphs keep extending the order
    across components, like the reference."""
    spark = graph.edges.sparkSession
    adj = _adjacency(graph, "all", max_driver_edges)
    for r in graph.vertices.collect():
        adj.setdefault(int(r[0]), [])
    if root is None:
        root = min(adj) if adj else 0
    elif root not in adj:
        raise ValueError(f"root {root} is not a vertex")
    # lazy max-heap on (-visited-neighbor count, id); counts only grow,
    # so a popped entry whose weight is stale gets re-pushed fresh
    wt = {v: 0 for v in adj}
    rank: dict[int, int] = {root: 0}
    heap: list[tuple[int, int]] = []
    for u in adj[root]:
        wt[u] += 1
        heapq.heappush(heap, (-wt[u], u))
    for v in adj:
        if v != root:
            heapq.heappush(heap, (-wt[v], v))
    while heap:
        w, v = heapq.heappop(heap)
        if v in rank:
            continue
        if -w != wt[v]:                    # stale
            heapq.heappush(heap, (-wt[v], v))
            continue
        rank[v] = len(rank)
        for u in adj[v]:
            if u not in rank:
                wt[u] += 1
                heapq.heappush(heap, (-wt[u], u))
    return spark.createDataFrame(
        [(v, r) for v, r in rank.items()], "id long, rank long")


def is_chordal(graph: Graph, ranks: DataFrame | None = None,
               max_driver_edges: int = MAX_DRIVER_EDGES) -> bool:
    """igraph_is_chordal: is the (undirected view of the) graph
    chordal?  Uses MCS ranks (computed if not supplied), then runs the
    Tarjan-Yannakakis perfect-elimination check distributed: rank the
    endpoints, find each vertex's latest-ranked earlier neighbor, and
    anti-join the remaining earlier neighbors against that parent's
    adjacency — any survivor is a missing chord."""
    if ranks is None:
        ranks = maximum_cardinality_search(
            graph, max_driver_edges=max_driver_edges)
    e = graph.edges.select(SRC, DST).where(F.col(SRC) != F.col(DST))
    sym = (e.unionByName(e.select(F.col(DST).alias(SRC),
                                  F.col(SRC).alias(DST)))
           .distinct())
    rs = ranks.select(F.col(ID).alias(SRC), F.col("rank").alias("r_s"))
    rd = ranks.select(F.col(ID).alias(DST), F.col("rank").alias("r_d"))
    # (v, u): u an earlier-ranked neighbor of v
    pred = (sym.join(rs, SRC).join(rd, DST)
            .where(F.col("r_d") < F.col("r_s"))
            .select(F.col(SRC).alias("v"), F.col(DST).alias("u"),
                    F.col("r_d").alias("ru")))
    parent = (pred.groupBy("v")
              .agg(F.max_by("u", "ru").alias("p")))
    need = (pred.join(parent, "v")
            .where(F.col("u") != F.col("p"))
            .select("p", "u"))
    missing = need.join(
        sym.select(F.col(SRC).alias("p"), F.col(DST).alias("u")),
        ["p", "u"], "left_anti")
    return missing.limit(1).count() == 0
