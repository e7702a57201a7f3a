"""Fast-greedy (Clauset-Newman-Moore) modularity communities.

Reference: igraph_community_fastgreedy
(/root/reference/src/fast_community.c), CNM 2004: start from singleton
communities, repeatedly merge the pair with the largest modularity
gain, track the best cut of the dendrogram.

The merge loop is inherently sequential (a global argmax heap updated
per merge — the reference's own structure), so the Spark-first shape is
the same driver-core-below-threshold pattern as the flow family:

  * <= ``driver_threshold`` edges: the weighted simple edge list is
    collected ONCE and CNM runs in-driver with a lazy max-heap —
    identical semantics to the reference.
  * above the threshold: one distributed Louvain contraction first
    (algorithms/louvain.py) shrinks the graph to its community graph —
    typically orders of magnitude smaller — and CNM agglomerates THAT
    in-driver; the final membership is the composition.  This is the
    standard hierarchical hybrid: exact CNM on the coarse graph,
    distributed local moving on the fine one.

Output: DataFrame(id, label) at the maximum-modularity cut, labels
dense in first-appearance-by-vertex-id order (same convention as
label_propagation / multilevel_communities).
"""

from __future__ import annotations

import heapq

from pyspark.sql import DataFrame, Window, functions as F

from igraph_spark.graph import Graph, SRC, DST, WEIGHT, ID


def _cnm(edge_rows, vert_ids, two_m: float | None = None,
         a_init: dict | None = None):
    """In-driver CNM -> {vertex: community_label} at the best-Q cut.

    ``edge_rows``: [(u, v, w)] canonical u < v simple undirected edges
    (no loops); ``vert_ids``: all vertices (isolates allowed).
    ``two_m`` / ``a_init``: optional externally supplied total weight
    and degree fractions — the hybrid coarse path passes the FINE
    graph's 2m and per-community strengths so intra-community mass
    (invisible in the contracted inter-edge list) still counts in a_i.
    """
    if two_m is None:
        two_m = 2.0 * sum(w for _, _, w in edge_rows)
    comm = {v: v for v in vert_ids}          # vertex -> current community
    members = {v: [v] for v in vert_ids}     # community -> vertices
    if two_m == 0.0:
        return comm
    # community state: a_i = K_i / 2m (degree fraction),
    # e[i][j] = w_ij / 2m for i != j (half-fraction of inter edges,
    # counted once per unordered pair)
    a = {v: 0.0 for v in vert_ids}
    e: dict[int, dict[int, float]] = {v: {} for v in vert_ids}
    for u, v, w in edge_rows:
        a[u] += w / two_m
        a[v] += w / two_m
        e[u][v] = e[u].get(v, 0.0) + w / two_m
        e[v][u] = e[v].get(u, 0.0) + w / two_m
    if a_init is not None:
        for v in a:
            a[v] = float(a_init.get(v, 0.0))
    # delta-Q of merging i,j = 2*(e_ij - a_i a_j)
    heap: list[tuple[float, int, int]] = []
    for u in e:
        for v, euv in e[u].items():
            if u < v:
                heapq.heappush(heap, (-(2.0 * (euv - a[u] * a[v])), u, v))
    alive = set(vert_ids)
    q = 0.0
    # running Q relative to the singleton start; best cut tracked
    best_q, merges, best_len = 0.0, [], 0
    while heap:
        ndq, i, j = heapq.heappop(heap)
        if i not in alive or j not in alive or j not in e[i]:
            continue
        dq = -ndq
        # lazy heap: re-validate against current state
        cur = 2.0 * (e[i][j] - a[i] * a[j])
        if abs(cur - dq) > 1e-12:
            heapq.heappush(heap, (-cur, i, j))
            continue
        if dq <= 1e-15:
            break
        # merge j into i
        q += dq
        merges.append((i, j))
        for k, ejk in e[j].items():
            if k == i:
                continue
            e[i][k] = e[i].get(k, 0.0) + ejk
            e[k][i] = e[i][k]
            del e[k][j]
            lo, hi = (i, k) if i < k else (k, i)
            heapq.heappush(
                heap, (-(2.0 * (e[i][k] - (a[i] + a[j]) * a[k])), lo, hi))
        e[i].pop(j, None)
        del e[j]
        for k in list(e[i]):
            if k in e and i in e[k]:
                lo, hi = (i, k) if i < k else (k, i)
                heapq.heappush(
                    heap, (-(2.0 * (e[i][k] - (a[i] + a[j]) * a[k])), lo, hi))
        a[i] += a[j]
        a[j] = 0.0
        alive.discard(j)
        members[i].extend(members.pop(j))
        if q > best_q + 1e-15:
            best_q, best_len = q, len(merges)
    # replay merges up to the best cut
    comm = {v: v for v in vert_ids}
    members = {v: [v] for v in vert_ids}
    for i, j in merges[:best_len]:
        for v in members[j]:
            comm[v] = i
        members[i].extend(members.pop(j))
    return comm


def fastgreedy_communities(graph: Graph, weights: bool | None = None,
                           driver_threshold: int = 200_000) -> DataFrame:
    """-> DataFrame(id, label): CNM communities at the best-modularity
    dendrogram cut (see module docstring for the hybrid scale path)."""
    spark = graph.edges.sparkSession
    und = graph if not graph.directed else graph.to_undirected("collapse")
    use_w = und.has_weights if weights is None else bool(weights)
    e = und.weighted_edges() if use_w else \
        und.edges.select(SRC, DST).withColumn(WEIGHT, F.lit(1.0))
    simple = (e.where(F.col(SRC) != F.col(DST))
              .select(F.least(SRC, DST).alias(SRC),
                      F.greatest(SRC, DST).alias(DST), WEIGHT)
              .groupBy(SRC, DST).agg(F.sum(WEIGHT).alias(WEIGHT)))

    coarse_of = None  # fine vertex -> coarse vertex (hybrid path)
    two_m, a_init = None, None
    if simple.count() > driver_threshold:
        from igraph_spark.algorithms.louvain import multilevel_communities
        lvl = multilevel_communities(und, max_levels=1)
        coarse_of = lvl.withColumnRenamed("label", "cv")
        # fine-graph 2m and per-community strengths: the contracted
        # inter-edge list alone would forget intra-community mass and
        # over-merge (CNM's a_i must be the true degree fraction)
        two_m = 2.0 * float(simple.agg(F.sum(WEIGHT)).first()[0] or 0.0)
        strength = (simple.select(F.col(SRC).alias(ID), WEIGHT)
                    .unionByName(simple.select(F.col(DST).alias(ID),
                                               WEIGHT))
                    .groupBy(ID).agg(F.sum(WEIGHT).alias("k")))
        ck = (strength.join(coarse_of, ID)
              .groupBy("cv").agg(F.sum("k").alias("kc")))
        a_init = {int(r["cv"]): float(r["kc"]) / two_m
                  for r in ck.collect()}
        simple = (simple
                  .join(coarse_of.select(F.col(ID).alias(SRC),
                                         F.col("cv").alias("cs")), SRC)
                  .join(coarse_of.select(F.col(ID).alias(DST),
                                         F.col("cv").alias("cd")), DST)
                  .where(F.col("cs") != F.col("cd"))
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
    comm = _cnm(rows, vids, two_m=two_m, a_init=a_init)
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
