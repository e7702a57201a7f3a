"""Subgraph isomorphism — igraph_(count_)subisomorphic_vf2
(/root/reference/src/topology.c:780-3119).

The reference's VF2 is a sequential backtracking search.  The
Spark-native shape is the classic multiway self-join: bind pattern
vertices one edge at a time over the (cached) edge table — each
pattern edge is one equi-join, injectivity and induced non-edge
constraints are column filters / anti-joins.  The intermediate row
count is the number of partial embeddings, which is exactly the work
any subgraph-matching system does; pattern-edge ORDER matters (bind
the most-constrained vertex next), handled by a greedy connectivity
ordering.

Counts include every injective mapping (all automorphic images), like
igraph_count_subisomorphisms_vf2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from igraph_spark.graph import Graph, SRC, DST


def _ordered_edges(pattern: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Reorder pattern edges so each (after the first) touches an
    already-bound vertex — turns the bind loop into connected joins."""
    remaining = list(pattern)
    ordered: list[tuple[int, int]] = []
    bound: set[int] = set()
    while remaining:
        pick = None
        for pe in remaining:
            if not bound or pe[0] in bound or pe[1] in bound:
                pick = pe
                break
        if pick is None:  # disconnected pattern component: start fresh
            pick = remaining[0]
        remaining.remove(pick)
        ordered.append(pick)
        bound.update(pick)
    return ordered


def subgraph_isomorphisms(graph: Graph, pattern: list[tuple[int, int]],
                          directed: bool | None = None,
                          induced: bool = False) -> DataFrame:
    """All injective mappings of ``pattern`` (vertices 0..k-1, edge
    list) into the graph -> DataFrame(v0, ..., v{k-1}) where column vi
    is the image of pattern vertex i.

    ``induced=True`` additionally requires pattern NON-edges to map to
    graph non-edges (igraph's induced variant / LAD-style).  Undirected
    graphs match each pattern edge in either orientation.
    """
    use_directed = graph.directed if directed is None else directed
    k = max(max(a, b) for a, b in pattern) + 1
    e = graph.edges.select(SRC, DST).where(F.col(SRC) != F.col(DST))
    if not use_directed:
        e = e.unionByName(e.select(F.col(DST).alias(SRC),
                                   F.col(SRC).alias(DST)))
    e = e.distinct().persist(StorageLevel.MEMORY_AND_DISK)

    cols = [f"v{i}" for i in range(k)]
    maps: DataFrame | None = None
    bound: set[int] = set()
    for (a, b) in _ordered_edges(pattern):
        ca, cb = f"v{a}", f"v{b}"
        if maps is None or (a not in bound and b not in bound):
            seed = e.select(F.col(SRC).alias(ca), F.col(DST).alias(cb))
            maps = seed if maps is None else maps.crossJoin(seed)
        elif a in bound and b in bound:
            # both endpoints bound: existence check for the edge
            maps = maps.join(
                e.select(F.col(SRC).alias(ca), F.col(DST).alias(cb)),
                [ca, cb], "left_semi")
        elif a in bound:
            maps = maps.join(
                e.select(F.col(SRC).alias(ca), F.col(DST).alias(cb)), ca)
        else:
            maps = maps.join(
                e.select(F.col(SRC).alias(ca), F.col(DST).alias(cb)), cb)
        newly = {a, b} - bound
        # injectivity against every previously bound vertex
        for nv in newly:
            for ov in bound | (newly - {nv}):
                if ov < nv or ov in bound:
                    maps = maps.where(F.col(f"v{nv}") != F.col(f"v{ov}"))
        bound |= newly
    if len(bound) != k:
        raise ValueError("pattern has isolated vertices; add them as "
                         "explicit edges or map them separately")

    if induced:
        pset = {(a, b) for a, b in pattern}
        if not use_directed:
            pset |= {(b, a) for a, b in pattern}
        for i in range(k):
            for j in range(k):
                if i != j and (i, j) not in pset:
                    if not use_directed and i > j:
                        continue  # each unordered non-edge checked once
                    maps = maps.join(
                        e.select(F.col(SRC).alias(f"v{i}"),
                                 F.col(DST).alias(f"v{j}")),
                        [f"v{i}", f"v{j}"], "left_anti")
    return maps.select(*cols)


def count_subisomorphisms(graph: Graph, pattern: list[tuple[int, int]],
                          directed: bool | None = None,
                          induced: bool = False) -> int:
    """igraph_count_subisomorphisms_vf2 analog."""
    return subgraph_isomorphisms(graph, pattern, directed, induced).count()
