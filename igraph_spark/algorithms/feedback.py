"""Feedback arc set — igraph_feedback_arc_set, Eades-Lin-Smyth
heuristic (/root/reference/src/feedback_arc_set.c:191,
IGRAPH_FAS_APPROX_EADES; the GLPK exact-IP variant is a documented
non-goal — no solver in scope).

The ELS vertex sequencing is a sequential peel (sinks to the back,
sources to the front, else the max out-in differential), so it runs
in-driver over a collected adjacency gated by the visitor-family edge
cap; the RESULT — every arc pointing backward in the sequence — is
resolved distributed by two rank joins, and removing those arcs
always leaves a DAG (the ELS guarantee, <= m/2 - n/6 arcs on simple
digraphs)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from igraph_spark.graph import Graph, ID, SRC, DST, WEIGHT
from igraph_spark.algorithms.visitors import MAX_DRIVER_EDGES


def _exact_fas_component(verts: list, W: dict) -> dict:
    """Minimum-weight linear ordering of one weak component by
    Held-Karp subset DP — the same optimum as the reference's
    IGRAPH_FAS_EXACT_IP linear-ordering IP (feedback_arc_set.c:429-536,
    max sum of forward weights), computed without an IP solver
    (documented deviation: exact DP instead of GLPK; identical
    minima).  f(S) = cost of the best prefix placing exactly S; placing
    v next adds the weight of arcs into v from the still-unplaced
    vertices: col_in(v) - sum_{u in S} w(u->v), where col_in is the
    total in-weight recomputed from W.  Returns {vertex: rank}.
    """
    import numpy as np
    n = len(verts)
    idx = {v: i for i, v in enumerate(verts)}
    Wm = np.zeros((n, n))
    for (u, v), w in W.items():
        Wm[idx[u], idx[v]] = w
    col_in = Wm.sum(axis=0)
    size = 1 << n
    # g[S][v] = sum_{u in S} w(u->v), built by lowest-bit recursion
    g = np.zeros((size, n))
    for S in range(1, size):
        lb = S & -S
        g[S] = g[S ^ lb] + Wm[lb.bit_length() - 1]
    f = np.full(size, np.inf)
    f[0] = 0.0
    parent = np.full(size, -1, dtype=np.int64)
    for S in range(size - 1):
        if not np.isfinite(f[S]):
            continue
        cand = f[S] + col_in - g[S]
        for v in range(n):
            if S >> v & 1:
                continue
            T = S | (1 << v)
            if cand[v] < f[T]:
                f[T] = cand[v]
                parent[T] = v
    order = []
    S = size - 1
    while S:
        v = int(parent[S])
        order.append(v)
        S ^= 1 << v
    order.reverse()  # order[i] = vertex index at rank i
    return {verts[v]: i for i, v in enumerate(order)}


def feedback_arc_set(graph: Graph, weights: bool | None = None,
                     method: str = "approx_eades",
                     max_driver_edges: int = MAX_DRIVER_EDGES,
                     max_exact_vertices: int = 16) -> DataFrame:
    """-> DataFrame(src, dst[, weight]): a set of arcs whose removal
    makes the graph acyclic.

    ``method="approx_eades"`` (default): the Eades-Lin-Smyth peel —
    ties break toward the smallest vertex id (deterministic; the
    reference follows heap order).

    ``method="exact_ip"`` (alias ``"exact"``): the minimum-weight
    feedback arc set, matching IGRAPH_FAS_EXACT_IP's linear-ordering
    semantics per weak component (feedback_arc_set.c:429) including
    self-loops in the result (:627); solved by Held-Karp subset DP
    instead of GLPK, gated at ``max_exact_vertices`` per component
    (the problem is NP-hard — the reference's IP has the same
    practical bound)."""
    if not graph.directed:
        raise ValueError("feedback arc set is defined for directed "
                         "graphs (an undirected graph's 'arcs' are a "
                         "spanning-forest complement — use "
                         "minimum_spanning_tree)")
    if method in ("exact", "exact_ip"):
        return _feedback_arc_set_exact(graph, weights, max_driver_edges,
                                       max_exact_vertices)
    if method != "approx_eades":
        raise ValueError(f"unknown method {method!r}")
    use_w = graph.has_weights if weights is None else bool(weights)
    e = graph.weighted_edges() if use_w else \
        graph.edges.select(SRC, DST).withColumn(WEIGHT, F.lit(1.0))
    e = e.where(F.col(SRC) != F.col(DST))
    m = e.count()
    if m > max_driver_edges:
        raise ValueError(
            f"ELS sequencing over {m} arcs exceeds max_driver_edges="
            f"{max_driver_edges}; raise the gate explicitly if the "
            "driver can hold the arc list")

    rows = [(int(r[SRC]), int(r[DST]), float(r[WEIGHT]))
            for r in e.collect()]
    verts = sorted({int(r[0]) for r in graph.vertices.collect()})
    outw = {v: 0.0 for v in verts}
    inw = {v: 0.0 for v in verts}
    out_nb: dict[int, dict[int, float]] = {v: {} for v in verts}
    in_nb: dict[int, dict[int, float]] = {v: {} for v in verts}
    for u, v, w in rows:
        outw[u] += w
        inw[v] += w
        out_nb[u][v] = out_nb[u].get(v, 0.0) + w
        in_nb[v][u] = in_nb[v].get(u, 0.0) + w

    remaining = set(verts)
    front: list[int] = []
    back: list[int] = []

    def remove(v):
        remaining.discard(v)
        for t, w in out_nb[v].items():
            if t in remaining:
                inw[t] -= w
                del in_nb[t][v]
        for s, w in in_nb[v].items():
            if s in remaining:
                outw[s] -= w
                del out_nb[s][v]

    while remaining:
        progressed = True
        while progressed:
            progressed = False
            sinks = sorted(v for v in remaining
                           if not any(t in remaining for t in out_nb[v]))
            for v in sinks:
                back.append(v)
                remove(v)
                progressed = True
            sources = sorted(v for v in remaining
                             if not any(s in remaining for s in in_nb[v]))
            for v in sources:
                front.append(v)
                remove(v)
                progressed = True
        if remaining:
            v = max(remaining, key=lambda x: (outw[x] - inw[x], -x))
            front.append(v)
            remove(v)

    order = front + back[::-1]
    spark = graph.edges.sparkSession
    ranks = spark.createDataFrame(
        [(v, i) for i, v in enumerate(order)], "id long, r long")
    rs = ranks.select(F.col(ID).alias(SRC), F.col("r").alias("r_s"))
    rd = ranks.select(F.col(ID).alias(DST), F.col("r").alias("r_d"))
    cols = [SRC, DST] + ([WEIGHT] if use_w else [])
    return (e.join(rs, SRC).join(rd, DST)
            .where(F.col("r_s") > F.col("r_d"))
            .select(*cols))


def _feedback_arc_set_exact(graph: Graph, weights: bool | None,
                            max_driver_edges: int,
                            max_exact_vertices: int) -> DataFrame:
    """Exact minimum FAS (see feedback_arc_set docstring)."""
    use_w = graph.has_weights if weights is None else bool(weights)
    e = graph.weighted_edges() if use_w else \
        graph.edges.select(SRC, DST).withColumn(WEIGHT, F.lit(1.0))
    m = e.count()
    if m > max_driver_edges:
        raise ValueError(
            f"exact FAS over {m} arcs exceeds max_driver_edges="
            f"{max_driver_edges}")
    rows = [(int(r[SRC]), int(r[DST]), float(r[WEIGHT]))
            for r in e.collect()]
    # weak components in-driver (the arc list already fits)
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v, _ in rows:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    comps: dict[int, list] = {}
    for x in parent:
        comps.setdefault(find(x), []).append(x)

    rank: dict[int, int] = {}
    for members in comps.values():
        members = sorted(members)
        if len(members) > max_exact_vertices:
            raise ValueError(
                f"exact FAS component has {len(members)} vertices > "
                f"max_exact_vertices={max_exact_vertices} (NP-hard; "
                f"use method='approx_eades' at this size)")
        W: dict[tuple, float] = {}
        mset = set(members)
        for u, v, w in rows:
            if u in mset and v in mset and u != v:
                W[(u, v)] = W.get((u, v), 0.0) + w
        rank.update(_exact_fas_component(members, W))

    spark = graph.edges.sparkSession
    ranks = spark.createDataFrame(list(rank.items()), "id long, r long")
    rs = ranks.select(F.col(ID).alias(SRC), F.col("r").alias("r_s"))
    rd = ranks.select(F.col(ID).alias(DST), F.col("r").alias("r_d"))
    cols = [SRC, DST] + ([WEIGHT] if use_w else [])
    # backward arcs in the optimal ordering + every self-loop
    # (feedback_arc_set.c:627: from == to || backward)
    return (e.join(rs, SRC).join(rd, DST)
            .where((F.col("r_s") > F.col("r_d"))
                   | (F.col(SRC) == F.col(DST)))
            .select(*cols))
