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
