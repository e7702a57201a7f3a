"""Maximum flow / minimum cut — igraph_maxflow, igraph_st_mincut,
igraph_mincut (/root/reference/src/flow.c:470,1615).

The reference runs single-node push-relabel.  Spark shape: Edmonds-Karp
— each augmentation is one distributed BFS over the residual graph
(the same frontier machinery as every other traversal here); the
augmenting path itself is O(V) driver-side state, exactly like the
reference's per-path bookkeeping.  Augmentation count is O(V*E) in
theory; like the reference's own usage (its test graphs are small),
this is a test/moderate-scale operator — the BSP BFS inside is what
scales.

Global undirected mincut = min over t != s of the s-t mincut for a
fixed s (standard reduction; matches igraph_mincut's fixture output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from igraph_spark.graph import Graph, SRC, DST, WEIGHT, ID


def _arcs(graph: Graph, weights: bool | None) -> DataFrame:
    use_w = graph.has_weights if weights is None else bool(weights)
    e = graph.weighted_edges() if use_w else \
        graph.edges.select(SRC, DST).withColumn(WEIGHT, F.lit(1.0))
    e = e.where(F.col(SRC) != F.col(DST))
    if not graph.directed:
        e = e.unionByName(e.select(F.col(DST).alias(SRC),
                                   F.col(SRC).alias(DST), WEIGHT))
    return (e.groupBy(SRC, DST).agg(F.sum(WEIGHT).alias("cap")))


def maxflow(graph: Graph, s: int, t: int, weights: bool | None = None,
            max_augmentations: int = 100000) -> dict:
    """-> {"value", "flow": DataFrame(src, dst, f),
    "partition": DataFrame(id, side) (side 0 = source side),
    "cut": DataFrame(src, dst, cap)} with max-flow == min-cut asserted
    by construction (the cut is the saturated residual frontier)."""
    spark = graph.edges.sparkSession
    arcs = _arcs(graph, weights).persist(StorageLevel.MEMORY_AND_DISK)
    flow: dict[tuple[int, int], float] = {}

    def residual_df():
        if flow:
            fdf = spark.createDataFrame(
                [(u, v, f) for (u, v), f in flow.items()],
                "src long, dst long, f double")
        else:
            fdf = spark.createDataFrame([], "src long, dst long, f double")
        rev = fdf.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST),
                         F.col("f").alias("bf"))
        res = (arcs.join(fdf, [SRC, DST], "full")
               .join(rev, [SRC, DST], "full")
               .select(SRC, DST,
                       (F.coalesce("cap", F.lit(0.0))
                        - F.coalesce("f", F.lit(0.0))
                        + F.coalesce("bf", F.lit(0.0))).alias("r"))
               .where(F.col("r") > 0))
        return res

    value = 0.0
    for _ in range(max_augmentations):
        res = residual_df().persist()
        # BFS with min-id parents over residual arcs
        visited = {int(s): None}
        frontier = spark.createDataFrame([(int(s),)], "id long")
        found = False
        while True:
            nxt = (frontier.join(res, frontier[ID] == res[SRC])
                   .groupBy(DST).agg(F.min(SRC).alias("parent"))
                   .collect())
            new = [(int(r[DST]), int(r["parent"])) for r in nxt
                   if int(r[DST]) not in visited]
            if not new:
                break
            for v, p in new:
                visited[v] = p
            if int(t) in visited:
                found = True
                break
            frontier = spark.createDataFrame([(v,) for v, _ in new],
                                             "id long")
        if not found:
            res.unpersist()
            break
        # reconstruct the augmenting path driver-side (O(V) state, like
        # the reference's per-path arrays)
        path = [int(t)]
        while path[-1] != int(s):
            path.append(visited[path[-1]])
        path.reverse()
        edges = list(zip(path, path[1:]))
        cond = None
        for u, v in edges:
            c = (F.col(SRC) == u) & (F.col(DST) == v)
            cond = c if cond is None else (cond | c)
        rmap = {(int(r[SRC]), int(r[DST])): float(r["r"])
                for r in res.where(cond).collect()}
        res.unpersist()
        delta = min(rmap[e] for e in edges)
        for u, v in edges:
            back = flow.get((v, u), 0.0)
            use = min(back, delta)
            if use > 0:
                flow[(v, u)] = back - use
            if delta - use > 0:
                flow[(u, v)] = flow.get((u, v), 0.0) + (delta - use)
        value += delta

    # source-side partition from the final residual reachability
    res = residual_df().persist()
    reach = {int(s)}
    frontier = spark.createDataFrame([(int(s),)], "id long")
    while True:
        nxt = (frontier.join(res, frontier[ID] == res[SRC])
               .select(F.col(DST).alias(ID)).distinct().collect())
        new = [int(r[ID]) for r in nxt if int(r[ID]) not in reach]
        if not new:
            break
        reach.update(new)
        frontier = spark.createDataFrame([(v,) for v in new], "id long")
    res.unpersist()
    part = graph.vertices.select(
        ID, F.when(F.col(ID).isin(list(reach)), 0).otherwise(1)
        .cast("long").alias("side"))
    cut = (arcs.where(F.col(SRC).isin(list(reach))
                      & ~F.col(DST).isin(list(reach)))
           .select(SRC, DST, "cap"))
    fdf = spark.createDataFrame(
        [(u, v, f) for (u, v), f in flow.items() if f > 0],
        "src long, dst long, f double") if flow else \
        spark.createDataFrame([], "src long, dst long, f double")
    arcs.unpersist()
    return {"value": value, "flow": fdf, "partition": part, "cut": cut}


def st_mincut(graph: Graph, s: int, t: int,
              weights: bool | None = None) -> dict:
    """igraph_st_mincut: the maxflow result read as a cut."""
    return maxflow(graph, s, t, weights)


def gomory_hu_tree(graph: Graph, weights: bool | None = None) -> DataFrame:
    """Gomory-Hu tree (igraph_gomory_hu_tree, the third member of the
    flow.c family) via Gusfield's algorithm: n-1 s-t maxflow calls, no
    vertex contraction -> DataFrame(src, dst, flow), a tree whose
    min-weight edge on the u..v path equals mincut(u, v) for EVERY
    pair.  Each maxflow is the distributed Edmonds-Karp above; the
    O(n) outer loop is driver-side like the reference's."""
    spark = graph.edges.sparkSession
    ids = [int(r[0]) for r in graph.vertices.select(ID).orderBy(ID)
           .collect()]
    parent = [ids[0]] * len(ids)
    fval = [0.0] * len(ids)
    for i in range(1, len(ids)):
        s, t = ids[i], parent[i]
        r = maxflow(graph, s, t, weights)
        fval[i] = r["value"]
        s_side = {int(x.id) for x in
                  r["partition"].where("side = 0").collect()}
        for j in range(i + 1, len(ids)):
            if parent[j] == t and ids[j] in s_side:
                parent[j] = s
    return spark.createDataFrame(
        [(ids[i], parent[i], fval[i]) for i in range(1, len(ids))],
        "src long, dst long, flow double")


def mincut(graph: Graph, weights: bool | None = None) -> dict:
    """Global minimum cut (igraph_mincut, flow.c:1615) for undirected
    graphs: min over t of the s-t mincut with s fixed to the minimum
    vertex id (any global cut separates s from some t)."""
    ids = [int(r[0]) for r in graph.vertices.select(ID).orderBy(ID)
           .collect()]
    s = ids[0]
    best = None
    for t in ids[1:]:
        cand = maxflow(graph, s, t, weights)
        if best is None or cand["value"] < best["value"]:
            best = cand
        if best["value"] == 0.0:
            break
    return best


def edge_connectivity(graph: Graph, s: int | None = None,
                      t: int | None = None) -> float:
    """igraph_st_edge_connectivity / igraph_edge_connectivity
    (flow.c family): unit-capacity maxflow; the global value is the
    unit-capacity global mincut (directed: min over both directions
    from a fixed root — any global cut separates the root from some
    vertex in one direction)."""
    if (s is None) != (t is None):
        raise ValueError("give both s and t, or neither")
    if s is not None:
        return maxflow(graph, s, t, weights=False)["value"]
    if not graph.directed:
        r = mincut(graph, weights=False)
        return r["value"] if r is not None else 0.0
    ids = [int(r[0]) for r in graph.vertices.select(ID).orderBy(ID)
           .collect()]
    root = ids[0]
    best = None
    for v in ids[1:]:
        for a, b in ((root, v), (v, root)):
            val = maxflow(graph, a, b, weights=False)["value"]
            if best is None or val < best:
                best = val
            if best == 0.0:
                return 0.0
    return best if best is not None else 0.0


def _split_arcs(graph: Graph) -> Graph:
    """Even-Tarjan vertex splitting: v -> v_in = 2v, v_out = 2v+1 with
    an internal unit arc, every edge (u, v) -> arc u_out -> v_in of
    effectively infinite capacity (cap n, one more than any vertex
    cut).  Vertex cuts of the original = unit-arc cuts of the split
    digraph."""
    n = graph.vcount()
    big = float(n + 1)
    e = graph.edges.select(SRC, DST).where(F.col(SRC) != F.col(DST))
    if not graph.directed:
        e = e.unionByName(e.select(F.col(DST).alias(SRC),
                                   F.col(SRC).alias(DST)))
    cross = e.select((F.col(SRC) * 2 + 1).alias(SRC),
                     (F.col(DST) * 2).alias(DST),
                     F.lit(big).alias(WEIGHT))
    internal = graph.vertices.select((F.col(ID) * 2).alias(SRC),
                                     (F.col(ID) * 2 + 1).alias(DST),
                                     F.lit(1.0).alias(WEIGHT))
    arcs = cross.unionByName(internal)
    verts = (graph.vertices.select((F.col(ID) * 2).alias(ID))
             .unionByName(graph.vertices.select((F.col(ID) * 2 + 1)
                                                .alias(ID))))
    return Graph(arcs, verts, directed=True)


def min_st_vertex_cut(graph: Graph, s: int, t: int) -> dict:
    """Minimum s-t vertex cut / separator (igraph_st_vertex_connectivity
    + igraph_minimum_size_separators' per-pair core): maxflow on the
    Even-Tarjan split digraph; the separator is the set of saturated
    internal arcs in the mincut -> {"value", "separator": [ids]}.
    s and t must be non-adjacent (else no vertex cut exists; raises,
    like the reference)."""
    adj = (graph.edges
           .where(((F.col(SRC) == s) & (F.col(DST) == t))
                  | ((F.col(SRC) == t) & (F.col(DST) == s))).limit(1)
           .count())
    if adj:
        raise ValueError("s and t are adjacent: no s-t vertex cut")
    split = _split_arcs(graph)
    r = maxflow(split, 2 * int(s) + 1, 2 * int(t), weights=True)
    sep = sorted(int(row[SRC]) // 2 for row in r["cut"].collect()
                 if int(row[SRC]) // 2 == int(row[DST]) // 2)
    return {"value": r["value"], "separator": sep}


def vertex_connectivity(graph: Graph, s: int | None = None,
                        t: int | None = None) -> float:
    """igraph_vertex_connectivity (flow.c family).

    st: unit internal-arc maxflow on the split digraph.  Global
    (undirected): the Even-Tarjan neighborhood scan — with v0 a
    minimum-degree vertex, any minimum cut either avoids v0 (some
    non-neighbor t lands across it: kappa(v0, t) finds it) or contains
    v0 (every vertex of a minimum cut has neighbors in every component,
    so two non-adjacent neighbors x, y of v0 straddle it:
    kappa(x, y) finds it).  O(deg(v0)^2) maxflow calls worst case —
    the reference's own complexity; at cluster scale pick v0 by
    min-degree exactly as here so deg(v0) is the graph's minimum."""
    if (s is None) != (t is None):
        raise ValueError("give both s and t, or neither")
    if s is not None:
        return min_st_vertex_cut(graph, s, t)["value"]
    if graph.directed:
        raise NotImplementedError("global vertex connectivity: "
                                  "undirected graphs")
    n = graph.vcount()
    if n < 2:
        return 0.0
    deg = (graph.degree(mode="all")
           .orderBy("degree", ID).first())
    v0, dmin = int(deg[0]), int(deg[1])
    if dmin == n - 1:      # complete graph: igraph convention n-1
        return float(n - 1)
    best = float(dmin)
    nbrs = {int(r[0]) for r in
            graph.edges.where(F.col(SRC) == v0)
            .select(F.col(DST).alias("nbr"))
            .unionByName(graph.edges.where(F.col(DST) == v0)
                         .select(F.col(SRC).alias("nbr")))
            .collect()}
    all_ids = [int(r[0]) for r in graph.vertices.select(ID).orderBy(ID)
               .collect()]
    for t_ in all_ids:
        if t_ == v0 or t_ in nbrs:
            continue
        best = min(best, min_st_vertex_cut(graph, v0, t_)["value"])
        if best == 0.0:
            return 0.0
    edge_set = {(int(r[SRC]), int(r[DST]))
                for r in graph.edges.select(SRC, DST).collect()}
    nb = sorted(nbrs)
    for i, x in enumerate(nb):
        for y in nb[i + 1:]:
            if (x, y) in edge_set or (y, x) in edge_set:
                continue
            best = min(best, min_st_vertex_cut(graph, x, y)["value"])
            if best == 0.0:
                return 0.0
    return best
