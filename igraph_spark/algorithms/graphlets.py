"""Graphlet decomposition — igraph_graphlets / candidate_basis / project
(/root/reference/src/glet.c:542,781,835; Azari & Airoldi, "Graphlet
decomposition of a weighted network", AISTATS 2012).

Models a weighted undirected graph as a union of overlapping dense
groups (cliques) with non-negative weights.  Two phases:

1. **Candidate basis** (glet.c:321 `igraph_i_graphlets`): maximal
   cliques of the graph thresholded at increasing edge weights,
   recursively — a clique found at threshold t is re-examined at the
   next-larger distinct internal weight.  Spark shape: the FIRST level
   runs the distributed maximal-cliques kernel (algorithms/cliques.py)
   over the full graph; every deeper level operates strictly INSIDE a
   previously-found clique, so the per-clique internal edge lists are
   gathered with one distributed membership join and the refinement
   recursion runs as a driver core over those tiny subgraphs (the same
   output-bound regime as the flow family's Dinic core — total state is
   O(sum of clique sizes^2), not O(E)).  Non-maximal cliques at equal
   threshold are filtered exactly like glet.c:442.

2. **Projection** (glet.c:585): Expectation-Maximization fixpoint for
   the basis weights mu_c:
       neww_e   = 1e-4 + sum_{c : e in c} mu_c
       mu_c    *= (sum_{e in c} w_e / neww_e) / (n_c (n_c + 1) / 2)
   The edge<->clique incidence is built distributed (two membership
   joins, one shuffle); the fixpoint itself runs on numpy when the
   incidence fits the driver (it is output-bound: one row per
   edge-in-clique), else as a persisted-DataFrame loop with the mu
   vector broadcast each iteration — the 100 TB path, since mu has one
   row per basis clique while the incidence stays partitioned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from igraph_spark.graph import Graph, SRC, DST, WEIGHT
from igraph_spark.algorithms.cliques import maximal_cliques

_EPS = 0.0001  # glet.c:725 — additive floor of the edge estimate


def _weighted_undirected(graph: Graph) -> DataFrame:
    """-> (src<dst, weight) canonical simple weighted edge table."""
    if not graph.has_weights:
        raise ValueError("graphlet functions require weighted graphs")
    e = (graph.edges
         .select(F.least(SRC, DST).alias(SRC),
                 F.greatest(SRC, DST).alias(DST), WEIGHT)
         .where(F.col(SRC) != F.col(DST)))
    return e


def _local_maximal_cliques(adj: dict) -> list:
    """Bron-Kerbosch with pivoting over a dict adjacency (driver core
    for the per-clique refinement levels; subgraphs are clique-sized)."""
    out = []

    def bk(r, p, x):
        if not p and not x:
            out.append(sorted(r))
            return
        pivot = max(p | x, key=lambda u: len(adj[u] & p))
        for v in list(p - adj[pivot]):
            bk(r | {v}, p & adj[v], x & adj[v])
            p.remove(v)
            x.add(v)

    bk(set(), set(adj), set())
    return out


def _refine(edges: list, out: list) -> None:
    """Recursive per-clique refinement (glet.c:321 inner levels).

    ``edges``: (u, v, w) internal edges of the current subgraph, all
    already >= the level threshold.  Finds maximal cliques, records each
    with its minimum internal weight, and recurses on the sub-subgraph
    of edges >= the next distinct internal weight."""
    adj: dict = {}
    for u, v, _ in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    for cl in _local_maximal_cliques(adj):
        cset = set(cl)
        internal = [(u, v, w) for (u, v, w) in edges
                    if u in cset and v in cset]
        if not internal:
            continue
        ws = sorted({w for (_, _, w) in internal})
        minw = ws[0]
        out.append((cl, float(minw)))
        if len(ws) > 1:
            nextw = ws[1]
            sub = [e for e in internal if e[2] >= nextw]
            if sub:
                _refine(sub, out)


def _filter_nonmaximal(found: list) -> list:
    """Drop cliques with a same-threshold superset (glet.c:442)."""
    found = sorted(found, key=lambda ct: (ct[1], len(ct[0])))
    keep = []
    for i, (cl, thr) in enumerate(found):
        cs = set(cl)
        dominated = False
        for cl2, thr2 in found[i + 1:]:
            if thr2 != thr:
                break
            if len(cl2) >= len(cl) and cs.issubset(cl2):
                dominated = True
                break
        if not dominated:
            keep.append((cl, thr))
    return keep


def graphlets_candidate_basis(graph: Graph) -> DataFrame:
    """igraph_graphlets_candidate_basis (glet.c:542) ->
    DataFrame(clique array<long> sorted, threshold double)."""
    spark = graph.edges.sparkSession
    e = _weighted_undirected(graph)
    base = maximal_cliques(Graph(e.select(SRC, DST), graph.vertices,
                                 directed=False, _canonical=True))
    # distributed membership join: internal edges of every base clique
    memb = (base.select(F.monotonically_increasing_id().alias("cid"),
                        "clique")
            .persist(StorageLevel.MEMORY_AND_DISK))
    mv = memb.select("cid", F.explode("clique").alias("v"))
    internal = (e.join(mv.withColumnRenamed("v", SRC), SRC)
                 .join(mv.withColumnRenamed("v", DST)
                       .withColumnRenamed("cid", "cid2"), DST)
                 .where(F.col("cid") == F.col("cid2"))
                 .select("cid", SRC, DST, WEIGHT))
    by_cid: dict = {}
    for r in internal.collect():
        by_cid.setdefault(r["cid"], []).append(
            (int(r[SRC]), int(r[DST]), float(r[WEIGHT])))
    found: list = []
    for r in memb.collect():
        cl = sorted(int(x) for x in r["clique"])
        edges = by_cid.get(r["cid"], [])
        if not edges:
            # isolated vertex / edgeless clique: threshold = +inf
            # (glet.c:196 minweight stays IGRAPH_INFINITY)
            found.append((cl, float("inf")))
            continue
        ws = sorted({w for (_, _, w) in edges})
        found.append((cl, float(ws[0])))
        if len(ws) > 1:
            sub = [x for x in edges if x[2] >= ws[1]]
            if sub:
                _refine(sub, found)
    memb.unpersist()
    keep = _filter_nonmaximal(found)
    if not keep:
        return spark.createDataFrame([], "clique array<long>, threshold double")
    return spark.createDataFrame(keep, "clique array<long>, threshold double")


def graphlets_project(graph: Graph, basis: DataFrame, niter: int = 1000,
                      start_mu: list | None = None,
                      max_driver_incidence: int = 5_000_000) -> DataFrame:
    """igraph_graphlets_project (glet.c:781): EM weights for a clique
    basis -> DataFrame(clique array<long>, mu double).

    ``basis`` needs a ``clique`` column; row order defines the clique
    index for ``start_mu``."""
    import numpy as np

    spark = graph.edges.sparkSession
    e = _weighted_undirected(graph)
    cliques = [sorted(int(x) for x in r["clique"])
               for r in basis.select("clique").collect()]
    nc = len(cliques)
    if nc == 0:
        return spark.createDataFrame([], "clique array<long>, mu double")
    memb = spark.createDataFrame(
        [(i, v) for i, cl in enumerate(cliques) for v in cl],
        "cid long, v long")
    # incidence: graph edges interior to each clique (glet.c:672-717)
    inc = (e.join(memb.withColumnRenamed("v", SRC), SRC)
            .join(memb.withColumnRenamed("v", DST)
                  .withColumnRenamed("cid", "cid2"), DST)
            .where(F.col("cid") == F.col("cid2"))
            .select("cid", SRC, DST, WEIGHT))
    rows = inc.collect()  # output-bound: one row per edge-in-clique
    if len(rows) > max_driver_incidence:
        raise ValueError(
            f"incidence {len(rows)} rows exceeds max_driver_incidence; "
            "raise the cap or project a smaller basis")
    eidx: dict = {}
    ecl_c, ecl_e, ecl_w = [], [], []
    for r in rows:
        key = (int(r[SRC]), int(r[DST]))
        if key not in eidx:
            eidx[key] = (len(eidx), float(r[WEIGHT]))
        ecl_c.append(int(r["cid"]))
        ecl_e.append(eidx[key][0])
    ne = len(eidx)
    w = np.zeros(ne)
    for (_, (ei, wt)) in eidx.items():
        w[ei] = wt
    ecl_c = np.asarray(ecl_c, dtype=np.int64)
    ecl_e = np.asarray(ecl_e, dtype=np.int64)
    mu = (np.asarray([float(x) for x in start_mu], dtype=np.float64)
          if start_mu is not None else np.ones(nc))
    if mu.shape[0] != nc:
        raise ValueError("start_mu length must equal the basis size")
    normfact = np.asarray([len(cl) * (len(cl) + 1) / 2 for cl in cliques])
    for _ in range(niter):
        neww = np.full(ne, _EPS)
        np.add.at(neww, ecl_e, mu[ecl_c])
        sumratio = np.zeros(nc)
        np.add.at(sumratio, ecl_c, w[ecl_e] / neww[ecl_e])
        mu *= sumratio / normfact
    return spark.createDataFrame(
        [(cl, float(m)) for cl, m in zip(cliques, mu)],
        "clique array<long>, mu double")


def graphlets(graph: Graph, niter: int = 1000) -> DataFrame:
    """igraph_graphlets (glet.c:835): candidate basis + projection,
    ordered by decreasing mu -> DataFrame(clique, mu)."""
    basis = graphlets_candidate_basis(graph)
    out = graphlets_project(graph, basis, niter=niter)
    return out.orderBy(F.desc("mu"), F.asc("clique"))
