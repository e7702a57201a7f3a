"""Hierarchical random graphs — igraph_hrg_fit / _sample / _game /
_predict (/root/reference/src/igraph_hrg.cc:349,421,522,809; Clauset,
Moore & Newman, "Hierarchical structure and the prediction of missing
links in networks", Nature 453, 2008).

An HRG is a binary dendrogram over the n vertices; each internal node
r carries a connection probability p_r, and P(edge i~j) = p at the
lowest common ancestor of i and j.  Three operations:

* **fit** — MCMC over dendrogram topologies (the CMN subtree-swap
  chain) maximizing the likelihood  prod_r p_r^{E_r}
  (1-p_r)^{L_r R_r - E_r}  at the per-node MLE p_r = E_r/(L_r R_r).
  A dendrogram walk is SEQUENTIAL BY DEFINITION (each Metropolis step
  conditions on the full current tree), so like the reference this is
  a driver core gated by ``max_driver_vertices``; randomness is a
  seeded PCG64, so fits are reproducible.
* **game/sample** — generating a graph from a fitted model IS
  distributed: every vertex pair has exactly one LCA, so the pair
  space partitions into per-internal-node blocks left-leaves x
  right-leaves.  We explode the two leaf arrays per node and flip one
  xxhash64 coin per pair — the same O(n^2)-candidate shape as
  gnp()/dot_product_game(), shuffle-free.
* **predict** — average LCA probability over an equilibrium sample of
  dendrograms for the non-edges (missing-link scores, hrg.cc:809).

The dendrogram interchange format is a DataFrame(node, left, right,
prob): internal nodes are 0..n-2 (0 = root), and in left/right a
value >= 0 is a leaf (vertex id) while -(k+1) refers to internal node
k — the same encoding as igraph_hrg_t's left/right vectors
(include/igraph_hrg.h).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F

from igraph_spark.graph import Graph, ID, SRC, DST


def _h(e: int, lr: int) -> float:
    """Per-node log-likelihood at the MLE p = e/lr (0 log 0 = 0)."""
    if lr == 0 or e == 0 or e == lr:
        return 0.0
    p = e / lr
    return e * math.log(p) + (lr - e) * math.log(1.0 - p)


class _Dendro:
    """Driver-core dendrogram state for the MCMC fit.

    Internal nodes n..2n-2 (root discovered dynamically); per node we
    keep children, parent, the leaf set, and the cross-edge count E."""

    def __init__(self, vids, adj, rng):
        self.adj = adj
        n = len(vids)
        self.n = n
        self.parent = {}
        self.child = {}
        self.leaves = {v: frozenset([v]) for v in vids}
        nodes = list(vids)
        perm = rng.permutation(len(nodes))
        nodes = [nodes[i] for i in perm]
        nxt = max(vids) + 1
        while len(nodes) > 1:
            a = nodes.pop(int(rng.integers(0, len(nodes))))
            b = nodes.pop(int(rng.integers(0, len(nodes))))
            self.child[nxt] = [a, b]
            self.parent[a] = nxt
            self.parent[b] = nxt
            self.leaves[nxt] = self.leaves[a] | self.leaves[b]
            nodes.append(nxt)
            nxt += 1
        self.root = nodes[0]
        # internal-node identities are stable across swap moves (only
        # child/sibling pointers change), so cache the candidate list
        self._internals = [r for r in self.child if r != self.root]
        self.E = {}
        for r in self.child:
            self.E[r] = self._count(r)

    def _count(self, r) -> int:
        a, b = self.child[r]
        la, lb = self.leaves[a], self.leaves[b]
        if len(la) > len(lb):
            la, lb = lb, la
        return sum(len(self.adj.get(u, set()) & lb) for u in la)

    def node_ll(self, r) -> float:
        a, b = self.child[r]
        lr = len(self.leaves[a]) * len(self.leaves[b])
        return _h(self.E[r], lr)

    def loglik(self) -> float:
        return sum(self.node_ll(r) for r in self.child)

    def try_move(self, rng) -> bool:
        """One CMN subtree-swap Metropolis step: pick a non-root
        internal node r, swap its sibling with one of its children."""
        internals = self._internals
        if not internals:
            return False
        r = internals[int(rng.integers(0, len(internals)))]
        p = self.parent[r]
        pc = self.child[p]
        s = pc[0] if pc[1] == r else pc[1]
        which = int(rng.integers(0, 2))
        a = self.child[r][which]          # child that becomes sibling
        if a == s:
            return False
        before = self.node_ll(r) + self.node_ll(p)
        oldE_r, oldE_p = self.E[r], self.E[p]
        old_leaves_r = self.leaves[r]
        # swap a <-> s
        self.child[r] = [s if c == a else c for c in self.child[r]]
        self.child[p] = [a if c == s else c for c in self.child[p]]
        self.parent[s], self.parent[a] = r, p
        self.leaves[r] = (old_leaves_r - self.leaves[a]) | self.leaves[s]
        self.E[r] = self._count(r)
        self.E[p] = self._count(p)
        after = self.node_ll(r) + self.node_ll(p)
        delta = after - before
        if delta >= 0 or rng.random() < math.exp(delta):
            return True
        # reject: undo
        self.child[r] = [a if c == s else c for c in self.child[r]]
        self.child[p] = [s if c == a else c for c in self.child[p]]
        self.parent[a], self.parent[s] = r, p
        self.leaves[r] = old_leaves_r
        self.E[r], self.E[p] = oldE_r, oldE_p
        return False

    def to_rows(self):
        """-> [(node, left, right, prob)] with root = 0 and children
        encoded igraph-style (leaf >= 0, internal k as -(k+1))."""
        order = []
        stack = [self.root]
        while stack:
            x = stack.pop()
            if x in self.child:
                order.append(x)
                stack.extend(self.child[x][::-1])
        relabel = {x: i for i, x in enumerate(order)}

        def enc(c):
            return -(relabel[c] + 1) if c in self.child else int(c)

        rows = []
        for x in order:
            a, b = self.child[x]
            lr = len(self.leaves[a]) * len(self.leaves[b])
            prob = self.E[x] / lr if lr else 0.0
            rows.append((relabel[x], enc(a), enc(b), float(prob)))
        return rows


def _collect_graph(graph: Graph, max_driver_vertices: int):
    vids = sorted(int(r[0]) for r in graph.vertices.select(ID).collect())
    if len(vids) > max_driver_vertices:
        raise ValueError(
            f"HRG MCMC is a sequential dendrogram walk: {len(vids)} "
            f"vertices > max_driver_vertices={max_driver_vertices}")
    adj: dict = {}
    for r in graph.edges.select(SRC, DST).collect():
        u, v = int(r[SRC]), int(r[DST])
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    return vids, adj


def hrg_fit(graph: Graph, steps: int | None = None, seed: int = 42,
            max_driver_vertices: int = 500) -> DataFrame:
    """igraph_hrg_fit (igraph_hrg.cc:349) -> dendrogram
    DataFrame(node, left, right, prob); node 0 is the root."""
    import numpy as np

    spark = graph.edges.sparkSession
    vids, adj = _collect_graph(graph, max_driver_vertices)
    if len(vids) < 2:
        return spark.createDataFrame(
            [], "node long, left long, right long, prob double")
    rng = np.random.Generator(np.random.PCG64(seed))
    d = _Dendro(vids, adj, rng)
    n = len(vids)
    if steps is None:
        steps = min(100 * n * n, 200_000)
    for _ in range(steps):
        d.try_move(rng)
    return spark.createDataFrame(
        d.to_rows(), "node long, left long, right long, prob double")


def _leaf_arrays(rows):
    """dendrogram rows -> {node: (left leaf list, right leaf list)}."""
    child = {r[0]: (r[1], r[2]) for r in rows}
    memo = {}

    def leaves(c):
        if c >= 0:
            return [c]
        k = -(c + 1)
        if k not in memo:
            a, b = child[k]
            memo[k] = leaves(a) + leaves(b)
        return memo[k]

    out = {}
    for node, (a, b) in child.items():
        out[node] = (leaves(a), leaves(b), )
    return out


def hrg_game(spark: SparkSession, hrg: DataFrame, seed: int = 42) -> Graph:
    """igraph_hrg_game (igraph_hrg.cc:522): sample a graph from a
    dendrogram.  Each pair's coin is flipped at its LCA block —
    distributed explode over per-node (left-leaves x right-leaves),
    one xxhash64 coin per pair, no shuffle."""
    rows = [(int(r["node"]), int(r["left"]), int(r["right"]),
             float(r["prob"])) for r in hrg.collect()]
    if not rows:
        return Graph(spark.createDataFrame([], "src long, dst long"),
                     directed=False, _canonical=True)
    probs = {r[0]: r[3] for r in rows}
    la = _leaf_arrays(rows)
    blocks = [(node, list(l), list(r), probs[node])
              for node, (l, r) in la.items()]
    bdf = spark.createDataFrame(
        blocks, "node long, lv array<long>, rv array<long>, prob double")
    pairs = (bdf.select("prob", F.explode("lv").alias("a"), "rv")
             .select("prob", "a", F.explode("rv").alias("b")))
    u = (F.xxhash64(F.least("a", "b"), F.greatest("a", "b"), F.lit(seed))
         .cast("double") / F.lit(2.0 ** 64)) + F.lit(0.5)
    e = (pairs.where(u < F.col("prob"))
         .select(F.least("a", "b").alias(SRC),
                 F.greatest("a", "b").alias(DST)))
    leaves = sorted({v for _, (l, r) in la.items() for v in l + r})
    vdf = spark.createDataFrame([(v,) for v in leaves], f"{ID} long")
    return Graph(e, vdf, directed=False, _canonical=True)


def hrg_sample(graph: Graph, seed: int = 42, steps: int | None = None,
               max_driver_vertices: int = 500) -> Graph:
    """igraph_hrg_sample (igraph_hrg.cc:421): fit then resample."""
    hrg = hrg_fit(graph, steps=steps, seed=seed,
                  max_driver_vertices=max_driver_vertices)
    return hrg_game(graph.edges.sparkSession, hrg, seed=seed + 1)


def hrg_predict(graph: Graph, num_samples: int = 25, period: int | None
                = None, burnin: int | None = None, seed: int = 42,
                max_driver_vertices: int = 500) -> DataFrame:
    """igraph_hrg_predict (igraph_hrg.cc:809): missing-link scores ->
    DataFrame(src, dst, prob), non-edges ordered by decreasing mean
    LCA probability over an equilibrium MCMC sample."""
    import numpy as np

    spark = graph.edges.sparkSession
    vids, adj = _collect_graph(graph, max_driver_vertices)
    n = len(vids)
    rng = np.random.Generator(np.random.PCG64(seed))
    d = _Dendro(vids, adj, rng)
    if burnin is None:
        burnin = 40 * n * n
    if period is None:
        period = max(n * n // 2, 1)
    for _ in range(burnin):
        d.try_move(rng)
    nonedges = [(u, v) for i, u in enumerate(vids) for v in vids[i + 1:]
                if v not in adj.get(u, set())]
    score = {pair: 0.0 for pair in nonedges}
    for _ in range(num_samples):
        for _ in range(period):
            d.try_move(rng)
        # p at the LCA for every non-edge of this sampled dendrogram
        for r in d.child:
            a, b = d.child[r]
            la, lb = d.leaves[a], d.leaves[b]
            lr = len(la) * len(lb)
            p = d.E[r] / lr if lr else 0.0
            if p == 0.0:
                continue
            small, big = (la, lb) if len(la) <= len(lb) else (lb, la)
            for u in small:
                for v in big:
                    key = (u, v) if u < v else (v, u)
                    if key in score:
                        score[key] += p
    rows = [(u, v, s / num_samples) for (u, v), s in score.items()]
    out = spark.createDataFrame(rows, "src long, dst long, prob double")
    return out.orderBy(F.desc("prob"), F.asc(SRC), F.asc(DST))
