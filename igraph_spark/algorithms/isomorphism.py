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


def _as_pattern(graph: Graph, max_vertices: int):
    """Collect a small graph into a dense-relabelled pattern edge list
    -> (edge list over 0..k-1, k, #isolated vertices)."""
    vids = sorted(int(r[0]) for r in graph.vertices.collect())
    if len(vids) > max_vertices:
        raise ValueError(
            f"whole-graph isomorphism enumerates vertex mappings — "
            f"gated at {max_vertices} vertices (got {len(vids)}); use "
            "algorithms.canonical.isomorphic_canonical (bliss analog, "
            "gated at 64) or wl_fingerprint at scale")
    edges = {(int(r[SRC]), int(r[DST]))
             for r in graph.edges.select(SRC, DST)
             .where(F.col(SRC) != F.col(DST)).distinct().collect()}
    touched = {v for e in edges for v in e}
    isolated = [v for v in vids if v not in touched]
    idx = {v: i for i, v in enumerate(v for v in vids if v in touched)}
    return ([(idx[a], idx[b]) for a, b in edges], len(idx), len(isolated))


def is_isomorphic(g1: Graph, g2: Graph,
                  max_vertices: int = 12) -> bool:
    """igraph_isomorphic (/root/reference/src/topology.c:819 — which
    dispatches 3/4-vertex graphs to isoclass and larger ones to VF2):
    exact graph isomorphism via the package's join-based VF2 analog,
    gated at ``max_vertices`` (mapping enumeration is exponential; the
    reference's bliss path is algorithms.canonical, gated at 64).
    Isolated
    vertices are interchangeable and compared by count."""
    if g1.directed != g2.directed:
        return False
    if g1.vcount() != g2.vcount() or g1.ecount() != g2.ecount():
        return False
    p, k, iso1 = _as_pattern(g1, max_vertices)
    _, k2, iso2 = _as_pattern(g2, max_vertices)
    if iso1 != iso2 or k != k2:
        return False
    if k == 0:
        return True
    deg = (lambda g: sorted(r["degree"] for r in g.degree().collect()))
    if deg(g1) != deg(g2):
        return False
    return count_subisomorphisms(g2, p, directed=g1.directed,
                                 induced=True) > 0


def count_automorphisms(graph: Graph, max_vertices: int = 12) -> int:
    """Number of automorphisms (the reference exposes this via
    igraph_count_subisomorphisms_vf2(g, g) — e.g.
    igraph_subisomorphic_lad.c:59): induced self-mappings, gated like
    is_isomorphic.  Isolated vertices contribute factorial(#isolated)."""
    import math
    p, k, iso = _as_pattern(graph, max_vertices)
    base = 1 if k == 0 else count_subisomorphisms(
        graph, p, directed=graph.directed, induced=True)
    return base * math.factorial(iso)
