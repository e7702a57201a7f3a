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


def feedback_arc_set(graph: Graph, weights: bool | None = None,
                     max_driver_edges: int = MAX_DRIVER_EDGES) -> DataFrame:
    """-> DataFrame(src, dst[, weight]): a set of arcs whose removal
    makes the graph acyclic.  Ties in the peel break toward the
    smallest vertex id (deterministic; the reference follows heap
    order)."""
    if not graph.directed:
        raise ValueError("feedback arc set is defined for directed "
                         "graphs (an undirected graph's 'arcs' are a "
                         "spanning-forest complement — use "
                         "minimum_spanning_tree)")
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
