"""Spinglass communities (Reichardt & Bornholdt 2006 Potts model).

Reference: igraph_community_spinglass
(/root/reference/src/clustertool.cpp:194, pottsmodel_2.cpp).
Semantics reproduced:

* **Objective** (update rule "config", the reference default): the
  RB Hamiltonian over ``q`` spin states,
  ``H = - sum_{(i,j) in E} w_ij d(s_i,s_j)
  + gamma * sum_{i<j} (k_i k_j / 2m) d(s_i,s_j)`` — at gamma == 1
  minimizing H is exactly maximizing modularity
  (clustertool.cpp:119, pottsmodel_2.cpp:266).
* **Search**: heat-bath simulated annealing — per node the new spin
  is drawn with probability proportional to ``exp(-E(s)/kT)`` where
  ``E(s) = -links_i(s) + gamma * k_i * K_s / 2m``
  (pottsmodel_2.cpp:388-402), cooling ``kT *= coolfact`` from
  ``starttemp`` to ``stoptemp`` (clustertool.cpp:74-75), then
  zero-temperature sweeps to a local minimum
  (HeatBathLookupZeroTemp, pottsmodel_2.cpp:477).
* Empty spins are dropped and labels densified in the package-wide
  first-appearance order.

Documented deviation (same class as SIR/games/infomap): the
reference draws from its RNG; this build uses a deterministic seeded
generator and a slightly faster default schedule
(``cool_fact=0.97``, 10 sweeps/temperature vs 0.99/50) — the
Hamiltonian and heat-bath rule are verbatim, and the reference's own
output is a random draw, so parity is distributional, asserted via
planted-structure recovery and modularity quality.

Scale path: the walktrap/fastgreedy hybrid — in-driver annealing
below ``vertex_threshold`` (annealing needs sequential single-spin
updates; the reference is equally driver-bound), one distributed
Louvain contraction above, annealing the weighted community graph.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame, Window, functions as F

from igraph_spark.graph import Graph, SRC, DST, WEIGHT, ID


def _spinglass_core(n, adj, deg, two_m, q, gamma, start_t, stop_t,
                    cool_fact, sweeps_per_temp, seed):
    """-> spin list over 0..n-1.  ``adj``: dict i -> dict j -> w
    (undirected, both directions present, no self entries)."""
    rng = random.Random(seed)
    if n == 0 or two_m <= 0.0:
        return list(range(n))
    spin = [rng.randrange(q) for _ in range(n)]
    kspin = [0.0] * q                        # K_s: degree mass per spin
    for i in range(n):
        kspin[spin[i]] += deg[i]

    def heat_bath(kT) -> int:
        changes = 0
        order = list(range(n))
        rng.shuffle(order)
        for i in order:
            cur = spin[i]
            links = {}
            for j, w in adj[i].items():
                s = spin[j]
                links[s] = links.get(s, 0.0) + w
            kspin[cur] -= deg[i]             # remove i, then re-place
            es = []
            for s in range(q):
                e = -links.get(s, 0.0) + \
                    gamma * deg[i] * kspin[s] / two_m
                es.append(e)
            if kT > 0.0:
                lo = min(es)
                ws = [math.exp(-(e - lo) / kT) for e in es]
                tot = sum(ws)
                r = rng.random() * tot
                acc = 0.0
                new = q - 1
                for s in range(q):
                    acc += ws[s]
                    if r <= acc:
                        new = s
                        break
            else:
                new = min(range(q), key=lambda s: (es[s], s))
            kspin[new] += deg[i]
            spin[i] = new
            if new != cur:
                changes += 1
        return changes

    kT = start_t
    while kT > stop_t:
        for _ in range(sweeps_per_temp):
            heat_bath(kT)
        kT *= cool_fact
    for _ in range(200):                     # zero-temp descent
        if heat_bath(0.0) == 0:
            break
    return spin


def spinglass_communities(graph: Graph, weights: bool | None = None,
                          spins: int = 25, gamma: float = 1.0,
                          start_temp: float = 1.0, stop_temp: float = 0.01,
                          cool_fact: float = 0.97,
                          sweeps_per_temp: int = 10, seed: int = 42,
                          vertex_threshold: int = 1500) -> DataFrame:
    """-> DataFrame(id, label): RB Potts-model communities, labels
    dense in first-appearance-by-vertex-id order (module docstring
    has the model and the hybrid scale path)."""
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
                  # cs == cd rows stay: contracted intra-community
                  # mass is spin-invariant in H but keeps the degrees
                  # (the null model) faithful to the fine graph
                  .select(F.least("cs", "cd").alias(SRC),
                          F.greatest("cs", "cd").alias(DST), WEIGHT)
                  .groupBy(SRC, DST).agg(F.sum(WEIGHT).alias(WEIGHT)))

    rows = [(int(r[SRC]), int(r[DST]), float(r[WEIGHT]))
            for r in simple.collect()]
    if coarse_of is None:
        vids = sorted(int(r[0])
                      for r in graph.vertices.select(ID).collect())
    else:
        vids = sorted(int(r[0])
                      for r in coarse_of.select("cv").distinct().collect())
    idx = {v: i for i, v in enumerate(vids)}
    n = len(vids)
    adj = [{} for _ in range(n)]
    deg = [0.0] * n
    two_m = 0.0
    for u, v, w in rows:
        iu, iv = idx[u], idx[v]
        if iu == iv:                 # hybrid self-loop: degrees only
            deg[iu] += 2.0 * w
            two_m += 2.0 * w
            continue
        adj[iu][iv] = adj[iu].get(iv, 0.0) + w
        adj[iv][iu] = adj[iv].get(iu, 0.0) + w
        deg[iu] += w
        deg[iv] += w
        two_m += 2.0 * w

    q = max(2, min(int(spins), n)) if n else 2
    spin = _spinglass_core(n, adj, deg, two_m, q, gamma, start_temp,
                           stop_temp, cool_fact, sweeps_per_temp, seed)

    cdf = spark.createDataFrame(
        [(vids[i], int(spin[i])) for i in range(n)], "v long, c long")
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
