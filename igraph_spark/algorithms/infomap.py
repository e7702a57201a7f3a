"""Infomap two-level communities (Rosvall & Bergstrom 2008).

Reference: igraph_community_infomap
(/root/reference/src/infomap.cc:273, infomap_FlowGraph.cc,
infomap_Greedy.cc).  Semantics reproduced:

* **Flow**: the stationary visit rate pi of a teleporting random walk
  (``alpha = 0.15``, uniform teleport weights, dangling mass
  redistributed by teleport weight, renormalized each step) — the
  power iteration of infomap_FlowGraph.cc:291-341 (``eigenvector()``).
  Undirected graphs walk each edge in both directions (the reference
  loads an undirected igraph as a symmetric directed FlowGraph).
* **Objective**: the two-level map equation
  ``L = plogp(q) - 2*sum_M plogp(q_M) + sum_M plogp(q_M + p_M)
  - sum_a plogp(pi_a)`` with module exits maintained exactly as in
  infomap_Greedy.cc:62-65 (``calibrate()``), including the
  teleportation cross-flow terms of Greedy::move
  (infomap_Greedy.cc:158-192).  Reported codelength is in bits
  (``/ log(2)``, infomap.cc:312).
* **Search**: Louvain-shaped alternation of node-level sweeps
  (Greedy::optimize — each node moves to the neighboring module, or
  an empty module, minimizing Delta-L) and module contraction
  (Greedy::level), repeated until the codelength stops improving.

Documented deviation (same class as SIR/games): the reference
shuffles node and candidate order with its RNG and takes the best of
``trials`` random restarts; this build uses a deterministic seeded
shuffle, so results are reproducible across runs and partitions.  The
objective, delta formulas and flow model are verbatim.

Scale path (the walktrap/fastgreedy hybrid): below
``vertex_threshold`` the edge list is collected ONCE and the full
search runs in-driver on dict-of-dict flows; above, one distributed
Louvain contraction shrinks the graph to its weighted community
graph, infomap agglomerates THAT in-driver, and the membership is the
composition.  ``map_equation()`` evaluates L for ANY membership fully
distributed (Catalyst aggregations only) — use it to score coarse
partitions at 100 TB scale.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame, Window, functions as F

from igraph_spark.graph import Graph, SRC, DST, WEIGHT, ID

ALPHA = 0.15          # teleport probability (infomap_FlowGraph.cc:30)
_EPS = 1e-10


def _plogp(x: float) -> float:
    return x * math.log(x) if x > 0.0 else 0.0


def _flow_model(n_idx, links, alpha=ALPHA):
    """pi, node_exit, flow, dangling for the teleporting walk.

    ``n_idx``: number of nodes; ``links``: dict i -> dict j -> weight
    (directed, normalized below; j == i entries are self-links).
    Mirrors FlowGraph::eigenvector + the exit/flow update
    (infomap_FlowGraph.cc:237-285).
    """
    beta = 1.0 - alpha
    tw = [1.0 / n_idx] * n_idx                     # uniform teleport
    p = [{} for _ in range(n_idx)]                 # P_ij (normalized)
    selfp = [0.0] * n_idx
    for i in range(n_idx):
        s = sum(links[i].values())
        if s <= 0.0:
            continue
        for j, w in links[i].items():
            if j == i:
                selfp[i] += w / s
            else:
                p[i][j] = p[i].get(j, 0.0) + w / s
    dangling = [not p[i] and selfp[i] <= 0.0 for i in range(n_idx)]

    pi = [1.0 / n_idx] * n_idx
    sqdiff = 1.0
    for it in range(200):
        dmass = sum(pi[i] for i in range(n_idx) if dangling[i])
        nxt = [(alpha + beta * dmass) * tw[i] for i in range(n_idx)]
        for i in range(n_idx):
            if selfp[i] > 0.0:
                nxt[i] += beta * selfp[i] * pi[i]
            for j, pij in p[i].items():
                nxt[j] += beta * pij * pi[i]
        tot = sum(nxt)
        old = sqdiff
        sqdiff = 0.0
        for i in range(n_idx):
            nxt[i] /= tot
            sqdiff += abs(nxt[i] - pi[i])
        pi = nxt
        if sqdiff == old:                          # FlowGraph.cc:333-336
            alpha += 1.0e-10
            beta = 1.0 - alpha
        if it >= 50 and sqdiff <= 1.0e-15:
            break

    flow = [{} for _ in range(n_idx)]              # beta*pi_i*P_ij
    self_flow = [beta * pi[i] * selfp[i] for i in range(n_idx)]
    for i in range(n_idx):
        for j, pij in p[i].items():
            flow[i][j] = beta * pi[i] * pij
    dang_size = [pi[i] if dangling[i] else 0.0 for i in range(n_idx)]
    node_exit = [pi[i]
                 - (alpha * pi[i] + beta * dang_size[i]) * tw[i]
                 - self_flow[i]
                 for i in range(n_idx)]
    return pi, tw, dang_size, node_exit, flow


class _Level:
    """One aggregation level: nodes with flows, greedy module moves."""

    def __init__(self, pi, tw, dang, nexit, out_flow, alpha=ALPHA):
        self.alpha, self.beta = alpha, 1.0 - alpha
        self.pi, self.tw, self.dang, self.nexit = pi, tw, dang, nexit
        self.out = out_flow
        n = len(pi)
        self.inn = [{} for _ in range(n)]
        for i in range(n):
            for j, fl in out_flow[i].items():
                self.inn[j][i] = fl
        # one module per node
        self.mod = list(range(n))
        self.m_size = list(pi)
        self.m_tw = list(tw)
        self.m_dang = list(dang)
        self.m_exit = list(nexit)
        self.m_members = [1] * n
        self.empty: list[int] = []
        self.exit_flow = sum(nexit)

    def codelength_terms(self):
        ele = sum(_plogp(x) for x in self.m_exit)
        sls = sum(_plogp(self.m_exit[m] + self.m_size[m])
                  for m in range(len(self.m_size)))
        return ele, sls

    def codelength(self, const_term: float) -> float:
        ele, sls = self.codelength_terms()
        return _plogp(self.exit_flow) - 2.0 * ele + sls - const_term

    def _flows_to(self, k: int, mods):
        """teleport+link flow (out, in) between node k and each module
        in ``mods`` (infomap_Greedy.cc:130-192)."""
        a, b = self.alpha, self.beta
        res = {}
        for m in mods:
            if m == self.mod[k]:
                o = (a * self.pi[k] + b * self.dang[k]) * \
                    (self.m_tw[m] - self.tw[k])
                i = (a * (self.m_size[m] - self.pi[k]) +
                     b * (self.m_dang[m] - self.dang[k])) * self.tw[k]
            else:
                o = (a * self.pi[k] + b * self.dang[k]) * self.m_tw[m]
                i = (a * self.m_size[m] + b * self.m_dang[m]) * self.tw[k]
            res[m] = [o, i]
        for j, fl in self.out[k].items():
            m = self.mod[j]
            if m in res and j != k:
                res[m][0] += fl
        for j, fl in self.inn[k].items():
            m = self.mod[j]
            if m in res and j != k:
                res[m][1] += fl
        return res

    def sweep(self, rng: random.Random) -> bool:
        """One randomized pass of Greedy::optimize; True if any move."""
        n = len(self.pi)
        order = list(range(n))
        rng.shuffle(order)
        moved = False
        for k in order:
            old = self.mod[k]
            cands = {self.mod[j] for j in self.out[k]} | \
                    {self.mod[j] for j in self.inn[k]} | {old}
            if self.m_members[old] > 1 and self.empty:
                cands.add(self.empty[-1])
            fl = self._flows_to(k, cands)
            if self.empty and self.empty[-1] in fl:
                # empty target: no flows by definition
                # (infomap_Greedy.cc:195-201)
                fl[self.empty[-1]] = [0.0, 0.0]
            out_old, in_old = fl[old]
            ex = self.exit_flow
            best, best_delta, best_of, best_if = old, -_EPS, 0.0, 0.0
            for m in sorted(cands):
                if m == old:
                    continue
                of, inf = fl[m]
                d_exit = _plogp(ex + out_old + in_old - of - inf) - \
                    _plogp(ex)
                d_ele = (-_plogp(self.m_exit[old]) - _plogp(self.m_exit[m])
                         + _plogp(self.m_exit[old] - self.nexit[k]
                                  + out_old + in_old)
                         + _plogp(self.m_exit[m] + self.nexit[k]
                                  - of - inf))
                d_sls = (-_plogp(self.m_exit[old] + self.m_size[old])
                         - _plogp(self.m_exit[m] + self.m_size[m])
                         + _plogp(self.m_exit[old] + self.m_size[old]
                                  - self.nexit[k] - self.pi[k]
                                  + out_old + in_old)
                         + _plogp(self.m_exit[m] + self.m_size[m]
                                  + self.nexit[k] + self.pi[k]
                                  - of - inf))
                delta = d_exit - 2.0 * d_ele + d_sls
                if delta < best_delta:
                    best, best_delta, best_of, best_if = m, delta, of, inf
            if best == old:
                continue
            # apply (infomap_Greedy.cc:266-303)
            self.exit_flow += out_old + in_old - best_of - best_if
            self.m_exit[old] += -self.nexit[k] + out_old + in_old
            self.m_size[old] -= self.pi[k]
            self.m_tw[old] -= self.tw[k]
            self.m_dang[old] -= self.dang[k]
            self.m_members[old] -= 1
            if self.m_members[old] == 0:
                self.empty.append(old)
            if self.m_members[best] == 0 and best in self.empty:
                self.empty.remove(best)
            self.m_exit[best] += self.nexit[k] - best_of - best_if
            self.m_size[best] += self.pi[k]
            self.m_tw[best] += self.tw[k]
            self.m_dang[best] += self.dang[k]
            self.m_members[best] += 1
            self.mod[k] = best
            moved = True
        return moved


def _infomap_core(n, links, alpha=ALPHA, seed=42):
    """-> (membership list over 0..n-1, codelength nats)."""
    if n == 0:
        return [], 0.0
    pi, tw, dang, nexit, flow = _flow_model(n, links, alpha)
    const_term = sum(_plogp(x) for x in pi)
    rng = random.Random(seed)

    membership = list(range(n))
    lvl = _Level(pi, tw, dang, nexit, flow, alpha)
    best_len = lvl.codelength(const_term)
    while True:
        changed = False
        for _ in range(100):
            if not lvl.sweep(rng):
                break
            changed = True
        new_len = lvl.codelength(const_term)
        if not changed or new_len > best_len - _EPS:
            break
        best_len = new_len
        # contract: modules become nodes (Greedy::level); termination
        # is the epsilon-improvement test above, so a no-op contraction
        # just re-enters sweep once and exits via `not changed`
        mods = sorted({m for m in lvl.mod})
        remap = {m: i for i, m in enumerate(mods)}
        membership = [remap[lvl.mod[membership[v]]] for v in range(n)]
        k = len(mods)
        c_pi = [0.0] * k
        c_tw = [0.0] * k
        c_dang = [0.0] * k
        c_exit = [lvl.m_exit[m] for m in mods]
        c_flow = [{} for _ in range(k)]
        for i in range(len(lvl.pi)):
            mi = remap[lvl.mod[i]]
            c_pi[mi] += lvl.pi[i]
            c_tw[mi] += lvl.tw[i]
            c_dang[mi] += lvl.dang[i]
            for j, fl in lvl.out[i].items():
                mj = remap[lvl.mod[j]]
                if mi != mj:
                    c_flow[mi][mj] = c_flow[mi].get(mj, 0.0) + fl
        lvl = _Level(c_pi, c_tw, c_dang, c_exit, c_flow, alpha)
    # fold the last (unimproved-or-final) assignment in
    final = [lvl.mod[membership[v]] for v in range(n)]
    return final, min(best_len, lvl.codelength(const_term))


def _collect_links(graph: Graph, weights):
    """edges -> (n, links dict over dense 0..n-1, vids) in driver."""
    use_w = graph.has_weights if weights is None else bool(weights)
    e = graph.weighted_edges() if use_w else \
        graph.edges.select(SRC, DST).withColumn(WEIGHT, F.lit(1.0))
    rows = [(int(r[SRC]), int(r[DST]), float(r[WEIGHT]))
            for r in e.collect()]
    vids = sorted({int(r[0]) for r in graph.vertices.select(ID).collect()})
    idx = {v: i for i, v in enumerate(vids)}
    n = len(vids)
    links = [{} for _ in range(n)]
    for u, v, w in rows:
        iu, iv = idx[u], idx[v]
        links[iu][iv] = links[iu].get(iv, 0.0) + w
        if not graph.directed and iu != iv:
            links[iv][iu] = links[iv].get(iu, 0.0) + w
    return n, links, vids


def infomap_communities(graph: Graph, weights: bool | None = None,
                        seed: int = 42,
                        vertex_threshold: int = 4000) -> DataFrame:
    """-> DataFrame(id, label): two-level map-equation communities,
    labels dense in first-appearance-by-vertex-id order (module
    docstring has the flow model and the hybrid scale path)."""
    spark = graph.edges.sparkSession

    coarse_of = None
    g = graph
    if graph.vcount() > vertex_threshold:
        from igraph_spark.algorithms.louvain import multilevel_communities
        lvl = multilevel_communities(graph, max_levels=1)
        coarse_of = lvl.withColumnRenamed("label", "cv")
        use_w = graph.has_weights if weights is None else bool(weights)
        e = graph.weighted_edges() if use_w else \
            graph.edges.select(SRC, DST).withColumn(WEIGHT, F.lit(1.0))
        coarse_e = (e
                    .join(coarse_of.select(F.col(ID).alias(SRC),
                                           F.col("cv").alias("cs")), SRC)
                    .join(coarse_of.select(F.col(ID).alias(DST),
                                           F.col("cv").alias("cd")), DST)
                    .select(F.col("cs").alias(SRC),
                            F.col("cd").alias(DST), WEIGHT)
                    .groupBy(SRC, DST).agg(F.sum(WEIGHT).alias(WEIGHT)))
        g = Graph(coarse_e, directed=graph.directed)
        weights = True

    n, links, vids = _collect_links(g, weights)
    member, _ = _infomap_core(n, links, seed=seed)
    cdf = spark.createDataFrame(
        [(vids[i], int(member[i])) for i in range(n)], "v long, c long")
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


def infomap_codelength(graph: Graph, membership: DataFrame | None = None,
                       weights: bool | None = None,
                       seed: int = 42) -> float:
    """Two-level codelength in BITS (infomap.cc:312 divides by log 2)
    for ``membership`` (id, label), or for the infomap partition when
    None.  In-driver exact evaluation; ``map_equation`` is the
    distributed evaluator for big graphs."""
    n, links, vids = _collect_links(graph, weights)
    if n == 0:
        return 0.0
    if membership is None:
        member, length = _infomap_core(n, links, seed=seed)
        return length / math.log(2.0)
    idx = {v: i for i, v in enumerate(vids)}
    mod = [0] * n
    for r in membership.collect():
        mod[idx[int(r[0])]] = int(r[1])
    return _codelength_of(n, links, mod) / math.log(2.0)


def _codelength_of(n, links, mod, alpha=ALPHA) -> float:
    pi, tw, dang, nexit, flow = _flow_model(n, links, alpha)
    beta = 1.0 - alpha
    mods = sorted(set(mod))
    m_size = {m: 0.0 for m in mods}
    m_tw = {m: 0.0 for m in mods}
    m_dang = {m: 0.0 for m in mods}
    m_exit = {m: 0.0 for m in mods}
    for i in range(n):
        m = mod[i]
        m_size[m] += pi[i]
        m_tw[m] += tw[i]
        m_dang[m] += dang[i]
        m_exit[m] += nexit[i]
    for i in range(n):
        # subtract intra-module link + teleport flows from exits
        for j, fl in flow[i].items():
            if mod[j] == mod[i]:
                m_exit[mod[i]] -= fl
    for i in range(n):
        m = mod[i]
        m_exit[m] -= (alpha * pi[i] + beta * dang[i]) * \
            (m_tw[m] - tw[i])
    q = sum(m_exit.values())
    return (_plogp(q)
            - 2.0 * sum(_plogp(x) for x in m_exit.values())
            + sum(_plogp(m_exit[m] + m_size[m]) for m in mods)
            - sum(_plogp(x) for x in pi))


def map_equation(graph: Graph, membership: DataFrame,
                 weights: bool | None = None, iters: int = 60) -> float:
    """Distributed two-level map-equation score (bits) of a
    (id, label) membership — pure Catalyst aggregations over the
    teleporting-walk flow, so it scales to arbitrarily large graphs.

    Flow model == the reference's (alpha 0.15, uniform teleports,
    dangling redistribution): computed with the package PageRank
    (damping = 1 - alpha is exactly beta), then per-edge flows
    ``beta * pi_src * w/outdeg`` and module aggregates in one shuffle
    each.  Agrees with ``infomap_codelength`` to float tolerance
    (tests/test_infomap.py).
    """
    from igraph_spark.algorithms.pagerank import pagerank

    beta = 1.0 - ALPHA
    use_w = graph.has_weights if weights is None else bool(weights)
    # traversal view + out-degree convention EXACTLY as the package
    # pagerank builds them, so pi and the flows share one model
    if graph.directed:
        e = graph.weighted_edges() if use_w else \
            graph.edges.select(SRC, DST).withColumn(WEIGHT, F.lit(1.0))
    else:
        e = graph.sym_edges(weighted=use_w)
        if not use_w:
            e = e.withColumn(WEIGHT, F.lit(1.0))
    pr = pagerank(graph, damping=beta, weights=weights,
                  max_iter=iters, tol=0.0)
    pi = pr.select(ID, F.col("pagerank").alias("pi"))
    nv = graph.vcount()

    if use_w:
        outd = e.groupBy(SRC).agg(
            F.sum(F.greatest(WEIGHT, F.lit(0.0))).alias("outdeg"))
    else:
        outd = (e.where(F.col(SRC) != F.col(DST))
                .groupBy(SRC)
                .agg(F.count("*").cast("double").alias("outdeg")))
    mem = membership.select(ID, F.col("label").alias("m"))
    # per-edge flow beta*pi_i*P_ij, i != j, tagged with both modules
    fl = (e.where(F.col(SRC) != F.col(DST))
          .join(outd, SRC)
          .join(pi.withColumnRenamed(ID, SRC), SRC)
          .join(mem.select(F.col(ID).alias(SRC), F.col("m").alias("ms")),
                SRC)
          .join(mem.select(F.col(ID).alias(DST), F.col("m").alias("md")),
                DST)
          .select("ms", "md",
                  (F.lit(beta) * F.col("pi") * F.col(WEIGHT)
                   / F.col("outdeg")).alias("flow")))
    # node-level exit pieces: pi, dangling, self flow
    selfw = (e.where(F.col(SRC) == F.col(DST))
             .groupBy(SRC).agg(F.sum(WEIGHT).alias("sw")))
    node = (pi
            .join(outd.withColumnRenamed(SRC, ID), ID, "left")
            .join(selfw.withColumnRenamed(SRC, ID), ID, "left")
            .join(mem, ID)
            .select(
                "m", "pi",
                F.when(F.coalesce("outdeg", F.lit(0.0)) <= 0.0, F.col("pi"))
                .otherwise(F.lit(0.0)).alias("dang"),
                (F.lit(beta) * F.col("pi")
                 * F.coalesce(F.col("sw") / F.col("outdeg"), F.lit(0.0)))
                .alias("selfflow")))
    tw = 1.0 / nv
    magg = (node.groupBy("m").agg(
        F.sum("pi").alias("p_m"),
        F.sum("dang").alias("d_m"),
        F.count(F.lit(1)).alias("n_m"),
        F.sum(F.col("pi")
              - (F.lit(ALPHA) * F.col("pi")
                 + F.lit(beta) * F.col("dang")) * F.lit(tw)
              - F.col("selfflow")).alias("exit0")))
    intra = (fl.where(F.col("ms") == F.col("md"))
             .groupBy(F.col("ms").alias("m"))
             .agg(F.sum("flow").alias("intra")))
    plogp = (lambda c: F.when(c > 0.0, c * F.log(c)).otherwise(F.lit(0.0)))
    mods = (magg.join(intra, "m", "left")
            .select(
                "p_m",
                (F.col("exit0") - F.coalesce("intra", F.lit(0.0))
                 # intra-module teleport flow: sum_i (a*pi+b*dang)*
                 #   (tw_m - tw_i) = (a*p_m + b*d_m)*tw*(n_m - 1)
                 - (F.lit(ALPHA) * F.col("p_m")
                    + F.lit(beta) * F.col("d_m"))
                 * F.lit(tw) * (F.col("n_m") - 1)).alias("q_m")))
    row = (mods.agg(
        F.sum("q_m").alias("q"),
        F.sum(plogp(F.col("q_m"))).alias("ele"),
        F.sum(plogp(F.col("q_m") + F.col("p_m"))).alias("sls"))
        .collect()[0])
    const = pi.agg(F.sum(plogp(F.col("pi")))).collect()[0][0] or 0.0
    q = row["q"] or 0.0
    nats = _plogp(q) - 2.0 * (row["ele"] or 0.0) + (row["sls"] or 0.0) \
        - const
    return nats / math.log(2.0)
