"""Walktrap communities (Pons & Latapy 2005).

Reference: igraph_community_walktrap
(/root/reference/src/walktrap.cpp, walktrap_communities.cpp): merge
adjacent communities Ward-style by the random-walk distance
r^2(C1,C2) = sum_k (P^t_{C1,k} - P^t_{C2,k})^2 / d_k, where P^t_C is
the mean t-step transition row of the community, picking at each step
the merge minimizing Delta-sigma = |C1||C2| / (n(|C1|+|C2|)) * r^2;
the returned membership is the dendrogram cut with maximum modularity.

The merge loop is a global argmin heap updated per merge — the
reference's own sequential structure (walktrap_heap.cpp) — and the
walk vectors are dense n-length rows, so the Spark-first shape is the
driver-core-below-threshold pattern shared with fastgreedy/flow:

  * vcount <= ``vertex_threshold``: edges collected ONCE, P^t and the
    merge loop run in-driver on numpy dense rows — identical
    semantics to the reference.
  * above: one distributed Louvain contraction shrinks the graph to
    its (weighted) community graph, walktrap agglomerates THAT
    in-driver, and the final membership is the composition — the same
    hierarchical hybrid as fastgreedy_communities, because a dense
    P^t matrix over 10^9 vertices does not exist on any engine.

Output: DataFrame(id, label), labels dense in
first-appearance-by-vertex-id order (the package-wide community
convention).
"""

from __future__ import annotations

import heapq

from pyspark.sql import DataFrame, Window, functions as F

from igraph_spark.graph import Graph, SRC, DST, WEIGHT, ID


def _walktrap(edge_rows, vert_ids, steps: int = 4):
    """In-driver Pons-Latapy -> {vertex: community} at the best-Q cut.

    ``edge_rows``: [(u, v, w)] canonical u <= v simple undirected
    weighted edges; u == v rows are self-loops (the hybrid path's
    contracted intra-community mass — they count double in degrees and
    keep both the walk and the modularity curve faithful to the fine
    graph); ``vert_ids``: all vertices (isolates stay singleton
    communities — a random walk never leaves or enters them, and
    merges only join adjacent communities)."""
    import numpy as np

    vids = sorted(vert_ids)
    n = len(vids)
    idx = {v: i for i, v in enumerate(vids)}
    if n == 0:
        return {}
    two_m = 2.0 * sum(w for _, _, w in edge_rows)
    comm = {v: v for v in vids}
    if two_m == 0.0:
        return comm

    deg = np.zeros(n)
    A = np.zeros((n, n))
    loop_frac = 0.0
    for u, v, w in edge_rows:
        iu, iv = idx[u], idx[v]
        if iu == iv:
            A[iu, iu] += 2.0 * w
            deg[iu] += 2.0 * w
            loop_frac += 2.0 * w / two_m
            continue
        A[iu, iv] += w
        A[iv, iu] += w
        deg[iu] += w
        deg[iv] += w
    live = deg > 0
    P = np.zeros((n, n))
    P[live] = A[live] / deg[live, None]
    Pt = np.linalg.matrix_power(P, steps)
    inv_d = np.zeros(n)
    inv_d[live] = 1.0 / deg[live]

    # community state over LOCAL indices
    size = {i: 1 for i in range(n) if live[i]}
    vec = {i: Pt[i] for i in size}            # mean t-step row
    a = {i: deg[i] / two_m for i in size}     # degree fraction
    w_ext: dict[int, dict[int, float]] = {i: {} for i in size}
    for u, v, w in edge_rows:
        iu, iv = idx[u], idx[v]
        if iu == iv:
            continue
        w_ext[iu][iv] = w_ext[iu].get(iv, 0.0) + w / two_m
        w_ext[iv][iu] = w_ext[iv].get(iu, 0.0) + w / two_m
    members = {i: [i] for i in size}

    def dsigma(i, j):
        d2 = float(((vec[i] - vec[j]) ** 2 * inv_d).sum())
        return size[i] * size[j] / (n * (size[i] + size[j])) * d2

    heap = [(dsigma(i, j), i, j) for i in w_ext for j in w_ext[i] if i < j]
    heapq.heapify(heap)
    alive = set(size)
    q = loop_frac - sum(ai * ai for ai in a.values())
    best_q = q
    merges: list[tuple[int, int]] = []
    best_cut = 0
    nxt = n  # labels for merged communities

    while heap:
        ds, i, j = heapq.heappop(heap)
        if i not in alive or j not in alive or j not in w_ext[i]:
            continue
        if abs(ds - dsigma(i, j)) > 1e-12:       # stale entry
            heapq.heappush(heap, (dsigma(i, j), i, j))
            continue
        c = nxt
        nxt += 1
        q += 2.0 * (w_ext[i][j] - a[i] * a[j])
        size[c] = size[i] + size[j]
        vec[c] = (size[i] * vec[i] + size[j] * vec[j]) / size[c]
        a[c] = a[i] + a[j]
        members[c] = members.pop(i) + members.pop(j)
        nb = {}
        for k, wk in w_ext.pop(i).items():
            if k != j:
                nb[k] = nb.get(k, 0.0) + wk
        for k, wk in w_ext.pop(j).items():
            if k != i:
                nb[k] = nb.get(k, 0.0) + wk
        w_ext[c] = nb
        alive.discard(i)
        alive.discard(j)
        alive.add(c)
        for k, wk in nb.items():
            w_ext[k].pop(i, None)
            w_ext[k].pop(j, None)
            w_ext[k][c] = wk
            lo, hi = (c, k) if c < k else (k, c)
            heapq.heappush(heap, (dsigma(lo, hi), lo, hi))
        merges.append((i, j))
        if q > best_q + 1e-12:
            best_q = q
            best_cut = len(merges)

    # replay merges up to the best cut
    parent = {}
    lbl = n
    for step, (i, j) in enumerate(merges):
        if step >= best_cut:
            break
        parent[i] = lbl
        parent[j] = lbl
        lbl += 1

    def root(x):
        while x in parent:
            x = parent[x]
        return x

    # map each vertex to the min original-id member of its final
    # community (stable label before the dense relabel outside)
    rootmap: dict[int, list[int]] = {}
    for i in range(n):
        if live[i]:
            rootmap.setdefault(root(i), []).append(i)
        else:
            rootmap.setdefault(i, []).append(i)
    out = {}
    for _, mem in rootmap.items():
        label = vids[min(mem)]
        for i in mem:
            out[vids[i]] = label
    return out


def walktrap_communities(graph: Graph, weights: bool | None = None,
                         steps: int = 4,
                         vertex_threshold: int = 4000) -> DataFrame:
    """-> DataFrame(id, label): walktrap communities at the
    best-modularity dendrogram cut (module docstring has the hybrid
    scale path)."""
    spark = graph.edges.sparkSession
    und = graph if not graph.directed else graph.to_undirected("collapse")
    use_w = und.has_weights if weights is None else bool(weights)
    e = und.weighted_edges() if use_w else \
        und.edges.select(SRC, DST).withColumn(WEIGHT, F.lit(1.0))
    simple = (e.where(F.col(SRC) != F.col(DST))
              .select(F.least(SRC, DST).alias(SRC),
                      F.greatest(SRC, DST).alias(DST), WEIGHT)
              .groupBy(SRC, DST).agg(F.sum(WEIGHT).alias(WEIGHT)))

    coarse_of = None
    if und.vcount() > vertex_threshold:
        from igraph_spark.algorithms.louvain import multilevel_communities
        lvl = multilevel_communities(und, max_levels=1)
        coarse_of = lvl.withColumnRenamed("label", "cv")
        simple = (simple
                  .join(coarse_of.select(F.col(ID).alias(SRC),
                                         F.col("cv").alias("cs")), SRC)
                  .join(coarse_of.select(F.col(ID).alias(DST),
                                         F.col("cv").alias("cd")), DST)
                  # keep cs == cd rows: contracted intra-community
                  # mass becomes self-loops the driver core understands
                  .select(F.least("cs", "cd").alias(SRC),
                          F.greatest("cs", "cd").alias(DST), WEIGHT)
                  .groupBy(SRC, DST).agg(F.sum(WEIGHT).alias(WEIGHT)))

    rows = [(int(r[SRC]), int(r[DST]), float(r[WEIGHT]))
            for r in simple.collect()]
    if coarse_of is None:
        vids = [int(r[0]) for r in graph.vertices.select(ID).collect()]
    else:
        vids = [int(r[0])
                for r in coarse_of.select("cv").distinct().collect()]
    comm = _walktrap(rows, vids, steps=steps)
    cdf = spark.createDataFrame(
        [(int(v), int(c)) for v, c in comm.items()], "v long, c long")
    if coarse_of is None:
        mem = cdf.select(F.col("v").alias(ID), F.col("c").alias("label"))
    else:
        mem = (coarse_of.join(cdf, coarse_of["cv"] == cdf["v"])
               .select(ID, F.col("c").alias("label")))
    firsts = mem.groupBy("label").agg(F.min(ID).alias("fid"))
    dense = firsts.select(
        "label", (F.dense_rank().over(Window.orderBy("fid")) - 1)
        .cast("long").alias("dl"))
    return (mem.join(F.broadcast(dense), "label")
            .select(ID, F.col("dl").alias("label")))
