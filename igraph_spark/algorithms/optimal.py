"""Exact modularity maximization (igraph_community_optimal_modularity).

Reference: /root/reference/src/optimal_modularity.c — the reference
formulates max-modularity as an integer program over community
indicator variables and hands it to GLPK; it is explicitly a
small-graph routine (driver-bound by the solver).  This build solves
the same NP-hard problem exactly with a branch-and-bound over
restricted-growth partition assignments instead of an IP solver:

* Only the off-diagonal pair terms of the modularity matrix
  ``b_ij = 2 (A_ij - k_i k_j / 2m) / 2m`` depend on the partition
  (diagonal terms are constant), so vertices are placed one at a
  time — into an existing group or a fresh one — accumulating
  ``sum b_uv`` over same-group pairs.
* Bound: the optimistic suffix ``sum over undecided pairs of
  max(b_ij, 0)``; branches whose current + suffix cannot beat the
  incumbent are cut.  Vertices are pre-ordered by degree descending
  (decides heavy pairs early, tightens the bound).
* Symmetry is broken canonically: a vertex may open at most one new
  group (restricted growth strings), so each partition is visited
  once.

Exactness is oracle-checked against full partition enumeration on
small graphs (tests/test_optimal.py).  ``max_vertices`` guards the
exponential worst case exactly as the reference's solver does in
practice; large graphs belong to louvain/fastgreedy/leading-eigenvector.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from igraph_spark.graph import Graph, SRC, DST, WEIGHT, ID


def _optimal_partition(n, b, order):
    """Branch-and-bound over partitions of 0..n-1.

    ``b``: symmetric pair-gain matrix (list of lists), ``order``: the
    placement order.  Returns the best assignment list (group index
    per vertex) maximizing the sum of b over same-group pairs."""
    # suffix bound: undecided pairs are those whose LATER placement
    # position is >= t
    suffix = [0.0] * (n + 1)
    for t in range(n - 1, -1, -1):
        v = order[t]
        # pairs whose LATER endpoint sits at position t
        gain = sum(b[u][v] for u in order[:t] if b[u][v] > 0.0)
        suffix[t] = suffix[t + 1] + gain
    best_val = -1.0
    best_assign = None
    assign = [-1] * n
    # groups as list of member lists
    members: list[list[int]] = []

    def rec(t, cur):
        nonlocal best_val, best_assign
        if cur + suffix[t] <= best_val + 1e-15:
            return
        if t == n:
            best_val = cur
            best_assign = assign[:]
            return
        v = order[t]
        for gi, mem in enumerate(members):
            add = sum(b[u][v] for u in mem)
            assign[v] = gi
            mem.append(v)
            rec(t + 1, cur + add)
            mem.pop()
        members.append([v])
        assign[v] = len(members) - 1
        rec(t + 1, cur)
        members.pop()
        assign[v] = -1

    rec(0, 0.0)
    return best_assign


def optimal_modularity(graph: Graph, weights: bool | None = None,
                       max_vertices: int = 24) -> DataFrame:
    """-> DataFrame(id, label): the EXACT maximum-modularity partition,
    labels dense in first-appearance-by-vertex-id order.

    Raises ValueError above ``max_vertices`` — exact modularity is
    NP-hard and the reference's GLPK formulation has the same
    practical ceiling (optimal_modularity.c docs: small graphs only).
    """
    spark = graph.edges.sparkSession
    und = graph if not graph.directed else graph.to_undirected("collapse")
    use_w = und.has_weights if weights is None else bool(weights)
    e = und.weighted_edges() if use_w else \
        und.edges.select(SRC, DST).withColumn(WEIGHT, F.lit(1.0))
    simple = (e.where(F.col(SRC) != F.col(DST))
              .select(F.least(SRC, DST).alias(SRC),
                      F.greatest(SRC, DST).alias(DST), WEIGHT)
              .groupBy(SRC, DST).agg(F.sum(WEIGHT).alias(WEIGHT)))
    vids = sorted(int(r[0]) for r in graph.vertices.select(ID).collect())
    n = len(vids)
    if n > max_vertices:
        raise ValueError(
            f"optimal_modularity is exact and exponential: {n} vertices "
            f"> max_vertices={max_vertices}; use multilevel_communities "
            "or fastgreedy_communities at scale")
    if n == 0:
        return spark.createDataFrame([], "id long, label long")
    idx = {v: i for i, v in enumerate(vids)}
    rows = [(idx[int(r[SRC])], idx[int(r[DST])], float(r[WEIGHT]))
            for r in simple.collect()]
    deg = [0.0] * n
    two_m = 0.0
    A = [[0.0] * n for _ in range(n)]
    for u, v, w in rows:
        A[u][v] += w
        A[v][u] += w
        deg[u] += w
        deg[v] += w
        two_m += 2.0 * w
    if two_m == 0.0:
        assign = list(range(n))
    else:
        b = [[2.0 * (A[i][j] - deg[i] * deg[j] / two_m) / two_m
              for j in range(n)] for i in range(n)]
        order = sorted(range(n), key=lambda i: -deg[i])
        assign = _optimal_partition(n, b, order)
    mem = spark.createDataFrame(
        [(vids[i], int(assign[i])) for i in range(n)],
        f"{ID} long, label long")
    firsts = mem.groupBy("label").agg(F.min(ID).alias("fid"))
    dense = firsts.select(
        "label", (F.dense_rank().over(Window.orderBy("fid")) - 1)
        .cast("long").alias("dl"))
    return (mem.join(F.broadcast(dense), "label")
            .select(ID, F.col("dl").alias("label")))
