"""Deterministic graph generators (SURVEY.md §2.2).

Spark-native analogs of igraph's constructors
(/root/reference/src/structure_generators.c, src/games.c): built from
``spark.range`` + column arithmetic (scale-out friendly) or literal
fixtures (test scale).  All randomness is hash-based and seeded —
``xxhash64(seed, i)`` — so every generator is exactly reproducible at
any partitioning/parallelism (no RNG state, unlike igraph's MT19937).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession, functions as F

from igraph_spark.graph import Graph

# Zachary karate club, 34 vertices / 78 undirected edges — public data
# (W. W. Zachary 1977), same fixture as igraph_famous("Zachary")
# (/root/reference/src/structure_generators.c:1922-1935).
KARATE_EDGES = [
    (0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (0, 6), (0, 7), (0, 8),
    (0, 10), (0, 11), (0, 12), (0, 13), (0, 17), (0, 19), (0, 21), (0, 31),
    (1, 2), (1, 3), (1, 7), (1, 13), (1, 17), (1, 19), (1, 21), (1, 30),
    (2, 3), (2, 7), (2, 27), (2, 28), (2, 32), (2, 9), (2, 8), (2, 13),
    (3, 7), (3, 12), (3, 13), (4, 6), (4, 10), (5, 6), (5, 10), (5, 16),
    (6, 16), (8, 30), (8, 32), (8, 33), (9, 33), (13, 33), (14, 32), (14, 33),
    (15, 32), (15, 33), (18, 32), (18, 33), (19, 33), (20, 32), (20, 33),
    (22, 32), (22, 33), (23, 25), (23, 27), (23, 32), (23, 33), (23, 29),
    (24, 25), (24, 27), (24, 31), (25, 31), (26, 29), (26, 33), (27, 33),
    (28, 31), (28, 33), (29, 32), (29, 33), (30, 32), (30, 33), (31, 32),
    (31, 33), (32, 33),
]


# Classic published graphs with the reference's vertex numbering
# (igraph_famous tables, structure_generators.c:1711-1887; the graphs
# themselves are public mathematical objects).  (n, edge list) pairs.
FAMOUS = {
    "bull": (5, [(0, 1), (0, 2), (1, 2), (1, 3), (2, 4)]),
    "diamond": (4, [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)]),
    "house": (5, [(0, 1), (0, 2), (1, 3), (2, 3), (2, 4), (3, 4)]),
    "housex": (5, [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
                   (2, 4), (3, 4)]),
    "tetrahedron": (4, [(0, 3), (1, 3), (2, 3), (0, 1), (1, 2), (0, 2)]),
    "tetrahedral": (4, [(0, 3), (1, 3), (2, 3), (0, 1), (1, 2), (0, 2)]),
    "octahedron": (6, [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5),
                       (0, 3), (0, 5), (1, 3), (1, 4), (2, 4), (2, 5)]),
    "cubical": (8, [(0, 1), (1, 2), (2, 3), (0, 3), (4, 5), (5, 6),
                    (6, 7), (4, 7), (0, 4), (1, 5), (2, 6), (3, 7)]),
    "petersen": (10, [(0, 1), (0, 4), (0, 5), (1, 2), (1, 6), (2, 3),
                      (2, 7), (3, 4), (3, 8), (4, 9), (5, 7), (5, 8),
                      (6, 8), (6, 9), (7, 9)]),
    "krackhardt_kite": (10, [(0, 1), (0, 2), (0, 3), (0, 5), (1, 3),
                             (1, 4), (1, 6), (2, 3), (2, 5), (3, 4),
                             (3, 5), (3, 6), (4, 6), (5, 6), (5, 7),
                             (6, 7), (7, 8), (8, 9)]),
    "dodecahedron": (20, [(0, 1), (0, 4), (0, 5), (1, 2), (1, 6),
                          (2, 3), (2, 7), (3, 4), (3, 8), (4, 9),
                          (5, 10), (5, 11), (6, 10), (6, 14), (7, 13),
                          (7, 14), (8, 12), (8, 13), (9, 11), (9, 12),
                          (10, 15), (11, 16), (12, 17), (13, 18),
                          (14, 19), (15, 16), (15, 19), (16, 17),
                          (17, 18), (18, 19)]),
}


def famous(spark: SparkSession, name: str) -> Graph:
    """igraph_famous analog (structure_generators.c:1979-2120): the
    classic small graphs with the reference's vertex numbering, plus
    Zachary (the parity fixture used by the reference's own LPA
    test)."""
    key = name.lower()
    if key == "zachary":
        return Graph.from_edge_list(spark, KARATE_EDGES, n=34,
                                    directed=False)
    if key in FAMOUS:
        n, edges = FAMOUS[key]
        return Graph.from_edge_list(spark, edges, n=n, directed=False)
    raise ValueError(f"unknown famous graph {name!r}")


def ring(spark: SparkSession, n: int, directed: bool = False) -> Graph:
    """igraph_ring (structure_generators.c:869): cycle 0-1-...-(n-1)-0."""
    e = spark.range(n).select(
        F.col("id").alias("src"),
        ((F.col("id") + 1) % n).alias("dst"))
    return Graph(e, spark.range(n).toDF("id"), directed=directed)


def path(spark: SparkSession, n: int, directed: bool = False) -> Graph:
    """1-D lattice (igraph_lattice, structure_generators.c:743)."""
    e = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    return Graph(e, spark.range(n).toDF("id"), directed=directed)


def star(spark: SparkSession, n: int, mode: str = "undirected") -> Graph:
    """igraph_star (structure_generators.c:651): center 0, leaves 1..n-1.
    mode: 'out' (center->leaf), 'in' (leaf->center), 'undirected'."""
    leaves = spark.range(1, n)
    if mode == "in":
        e = leaves.select(F.col("id").alias("src"), F.lit(0).cast("long").alias("dst"))
    else:
        e = leaves.select(F.lit(0).cast("long").alias("src"), F.col("id").alias("dst"))
    return Graph(e, spark.range(n).toDF("id"), directed=(mode != "undirected"))


def full(spark: SparkSession, n: int, directed: bool = False,
         loops: bool = False) -> Graph:
    """igraph_full (structure_generators.c:1003).  O(n^2) — test scale."""
    a = spark.range(n).toDF("src")
    b = spark.range(n).toDF("dst")
    e = a.crossJoin(b)
    if directed:
        e = e.where("src != dst") if not loops else e
    else:
        e = e.where("src < dst") if not loops else e.where("src <= dst")
    return Graph(e, spark.range(n).toDF("id"), directed=directed)


def tree(spark: SparkSession, n: int, children: int = 2,
         directed: bool = False) -> Graph:
    """igraph_tree (structure_generators.c:922): vertex i's parent is
    (i-1) div children."""
    e = spark.range(1, n).select(
        ((F.col("id") - 1) / children).cast("long").alias("src"),
        F.col("id").alias("dst"))
    return Graph(e, spark.range(n).toDF("id"), directed=directed)


def _u01(col: F.Column, seed: int, salt: int) -> F.Column:
    """Deterministic uniform [0,1) from a 64-bit column via xxhash64."""
    h = F.xxhash64(col, F.lit(seed), F.lit(salt))
    # map signed 64-bit hash to [0, 1)
    return (h.cast("double") / F.lit(2.0 ** 64)) + F.lit(0.5)


def gnm(spark: SparkSession, n: int, m: int, seed: int = 42,
        directed: bool = False, simple: bool = True) -> Graph:
    """Erdos-Renyi G(n,m) analog (games.c:665) via seeded hash sampling.

    Deterministic at any parallelism: edge i's endpoints are
    xxhash64(seed, i) mod n.  With ``simple`` the sample is oversized,
    loops/duplicates dropped, and the m smallest surviving candidate
    ids kept.  The "m smallest" selection is distributed — a bucketed
    id histogram picks the cutoff bucket (driver sees <=4096 counts)
    and only that one bucket is sorted — no global orderBy().limit(m)
    (which ships top-m per partition to the driver).  If dedup leaves
    fewer than m survivors the candidate pool is re-drawn doubled
    (dense n/m combinations) instead of silently returning a smaller
    graph.
    """
    def _cand(over: int):
        c = spark.range(over).select(
            F.col("id"),
            F.pmod(F.xxhash64(F.col("id"), F.lit(seed), F.lit(0)),
                   F.lit(n)).alias("src"),
            F.pmod(F.xxhash64(F.col("id"), F.lit(seed), F.lit(1)),
                   F.lit(n)).alias("dst"))
        return c

    if not simple:
        e = _cand(m).select("src", "dst")
        return Graph(e, spark.range(n).toDF("id"), directed=directed,
                     _canonical=False)

    max_possible = n * (n - 1) if directed else n * (n - 1) // 2
    if m > max_possible:
        raise ValueError(f"gnm: m={m} exceeds the {max_possible} possible "
                         f"simple edges on n={n}")
    over = int(m * 1.25) + 16
    for _attempt in range(8):
        cand = _cand(over).where("src != dst")
        if not directed:
            cand = cand.select("id", F.least("src", "dst").alias("src"),
                               F.greatest("src", "dst").alias("dst"))
        surv = cand.groupBy("src", "dst").agg(F.min("id").alias("id"))
        bw = max(1, over // 4096)
        hist = (surv.groupBy((F.col("id") / bw).cast("long").alias("b"))
                .count().orderBy("b").collect())
        total, cut_b, k_in_cut = 0, None, 0
        for r in hist:
            if total + r["count"] >= m:
                cut_b, k_in_cut = int(r["b"]), m - total
                break
            total += int(r["count"])
        if cut_b is None:  # undersampled after dedup: re-draw, doubled
            over *= 2
            continue
        below = surv.where(F.col("id") < cut_b * bw)
        incut = (surv.where((F.col("id") >= cut_b * bw)
                            & (F.col("id") < (cut_b + 1) * bw))
                 .orderBy("id").limit(k_in_cut))
        e = below.unionByName(incut).select("src", "dst")
        return Graph(e, spark.range(n).toDF("id"), directed=directed,
                     _canonical=not directed)
    raise ValueError(f"gnm: could not draw {m} simple edges on n={n} "
                     f"after oversampling to {over}")


def gnp(spark: SparkSession, n: int, p: float, seed: int = 42,
        directed: bool = False, loops: bool = False) -> Graph:
    """Erdos-Renyi G(n,p) (games.c:573) via hash-thresholded pair
    sampling: pair (i,j) is an edge iff u01(hash(i*n+j)) < p.
    Deterministic at any parallelism.  The candidate space is O(n^2)
    (igraph's geometric skipping is O(m) but sequential); use ``gnm``
    with m ~ Binomial(N, p)'s mean for large sparse graphs."""
    a = spark.range(n).toDF("src")
    b = spark.range(n).toDF("dst")
    pairs = a.crossJoin(b)
    if directed:
        pairs = pairs if loops else pairs.where("src != dst")
    else:
        pairs = pairs.where("src <= dst" if loops else "src < dst")
    u = _u01(F.col("src") * n + F.col("dst"), seed, 11)
    e = pairs.where(u < p)
    return Graph(e, spark.range(n).toDF("id"), directed=directed,
                 _canonical=not directed)


def barabasi(spark: SparkSession, n: int, m: int = 1, seed: int = 42,
             max_chase: int = 64) -> Graph:
    """Barabasi-Albert preferential attachment (games.c:486, bag
    model) via the Batagelj-Brandes construction, distributed.

    B-B stores the edge list as a flat array A where A[2t] is slot t's
    source vertex and A[2t+1] its target; slot t's target is the value
    at a uniform position k < 2t — picking a uniform *endpoint slot* is
    exactly degree-proportional sampling.  Even k resolves immediately
    (a source vertex, known from the slot index alone); odd k refers to
    an earlier slot's target, so resolution is a per-row pointer chase
    k -> (k-1)/2 -> ... whose position sequence is pure hash arithmetic
    on the slot index: NO shuffle, no sequential state, deterministic
    at any parallelism.  Chains shorten geometrically (each hop halves
    the index and terminates with prob 1/2), so ``max_chase`` = 64
    rounds is astronomically safe; the tail is verified empty.

    Like the reference's bag model, the result is a multigraph and may
    contain occasional self-loops; ``simplify`` drops them.
    Vertex i >= 1 contributes min(m, ...) = m slots (vertex 0 has no
    out-slots), so ecount = (n-1)*m.
    """
    if n < 2 or m < 1:
        raise ValueError("barabasi needs n >= 2, m >= 1")
    t_total = (n - 1) * m
    slots = spark.range(t_total).select(
        F.col("id").alias("t"),
        (F.floor(F.col("id") / m) + 1).alias("src"))

    def _k(ref: F.Column) -> F.Column:
        # B-B recurrence: slot t's target position is uniform in
        # [0, 2t+1) — position 2t (the slot's own source) is the
        # self-attachment mass of the bag model (games.c:486)
        return F.when(ref > 0,
                      F.pmod(F.xxhash64(ref, F.lit(seed)), 2 * ref + 1)) \
                .otherwise(F.lit(0))

    k0 = _k(F.col("t"))
    df = slots.select(
        "t", "src",
        F.when((k0 % 2 == 0) & (F.col("t") > 0),
               F.floor(k0 / 2 / m) + 1)
         .when(F.col("t") == 0, F.lit(0))
         .alias("dst"),
        F.when((k0 % 2 == 1), F.floor((k0 - 1) / 2)).alias("ref"))
    for rnd in range(max_chase):
        k = _k(F.col("ref"))
        df = df.select(
            "t", "src",
            F.when(F.col("dst").isNotNull(), F.col("dst"))
             .when(F.col("ref") == 0, F.lit(0))
             .when(k % 2 == 0, F.floor(k / 2 / m) + 1)
             .alias("dst"),
            F.when(F.col("dst").isNull() & (F.col("ref") > 0) & (k % 2 == 1),
                   F.floor((k - 1) / 2)).alias("ref"))
        if (rnd + 1) % 8 == 0:
            df = df.localCheckpoint(eager=True)
            if df.where(F.col("dst").isNull()).isEmpty():
                break
    unresolved = df.where(F.col("dst").isNull()).count()
    if unresolved:
        raise RuntimeError(f"barabasi: {unresolved} unresolved chains "
                           f"after {max_chase} rounds")
    e = df.select("src", F.col("dst").cast("long").alias("dst"))
    return Graph(e, spark.range(n).toDF("id"), directed=False)


def zipf_skew(spark: SparkSession, n: int, m: int, alpha: float = 2.0,
              seed: int = 42, directed: bool = True) -> Graph:
    """Skewed (hub-heavy) graph, the scale/skew analog of the
    Barabasi bench graph (examples/benchmarks/igraph_transitivity.c:46-48):
    src uniform, dst ~ Zipf-ish via u^alpha concentration onto low ids.
    Exercises hub salting / AQE skew handling.
    """
    base = spark.range(m)
    e = base.select(
        F.pmod(F.xxhash64("id", F.lit(seed), F.lit(0)), F.lit(n)).alias("src"),
        F.floor(F.pow(_u01(F.col("id"), seed, 1), F.lit(alpha)) * n)
         .cast("long").alias("dst"))
    return Graph(e, spark.range(n).toDF("id"), directed=directed)


def watts_strogatz(spark: SparkSession, n: int, k: int = 4,
                   p: float = 0.1, seed: int = 42) -> Graph:
    """Watts-Strogatz small world (games.c:2944): ring lattice where
    each vertex links its k/2 clockwise neighbors, then each edge's
    endpoint is rewired to a hash-uniform vertex with probability p.
    Deterministic at any parallelism (hash-driven rewiring, no RNG
    state); self-loops produced by rewiring are dropped like the
    reference's loops=false default."""
    if k % 2 or k <= 0:
        raise ValueError("watts_strogatz needs even k > 0")
    base = spark.range(n).toDF("i").crossJoin(
        spark.range(1, k // 2 + 1).toDF("j"))
    lattice = base.select(
        F.col("i").alias("src"),
        F.pmod(F.col("i") + F.col("j"), F.lit(n)).alias("dst"),
        (F.col("i") * (k // 2) + F.col("j")).alias("eid"))
    rewire = _u01(F.col("eid"), seed, 21) < p
    new_dst = F.pmod(F.xxhash64("eid", F.lit(seed), F.lit(22)), F.lit(n))
    e = (lattice.select("src",
                        F.when(rewire, new_dst).otherwise(F.col("dst"))
                        .alias("dst"))
         .where(F.col("src") != F.col("dst")))
    return Graph(e, spark.range(n).toDF("id"), directed=False)


def geometric(spark: SparkSession, n: int, radius: float,
              seed: int = 42, torus: bool = False) -> Graph:
    """Geometric random graph (games.c:2040): n points at hash-uniform
    unit-square coordinates, edge iff distance < radius.  O(n^2)
    candidate pairs — test scale, like the reference's own use."""
    pts = spark.range(n).select(
        F.col("id"),
        _u01(F.col("id"), seed, 31).alias("x"),
        _u01(F.col("id"), seed, 32).alias("y"))
    a = pts.select(F.col("id").alias("src"), F.col("x").alias("xa"),
                   F.col("y").alias("ya"))
    b = pts.select(F.col("id").alias("dst"), F.col("x").alias("xb"),
                   F.col("y").alias("yb"))
    dx = F.abs(F.col("xa") - F.col("xb"))
    dy = F.abs(F.col("ya") - F.col("yb"))
    if torus:
        dx = F.least(dx, 1.0 - dx)
        dy = F.least(dy, 1.0 - dy)
    e = (a.crossJoin(b).where(F.col("src") < F.col("dst"))
         .where(dx * dx + dy * dy < radius * radius)
         .select("src", "dst"))
    return Graph(e, spark.range(n).toDF("id"), directed=False,
                 _canonical=True)


def sbm(spark: SparkSession, n: int, blocks: int, p_in: float, p_out: float,
        seed: int = 42) -> Graph:
    """Stochastic block model (reference /root/reference/src/sbm.c:71) via
    hash-thresholded pair sampling.  O(n^2) candidate space — test scale
    only (community-detection fixtures)."""
    a = spark.range(n).toDF("src")
    b = spark.range(n).toDF("dst")
    pairs = a.crossJoin(b).where("src < dst")
    u = _u01(F.col("src") * n + F.col("dst"), seed, 7)
    same = (F.col("src") % blocks) == (F.col("dst") % blocks)
    e = pairs.where(F.when(same, u < p_in).otherwise(u < p_out))
    return Graph(e, spark.range(n).toDF("id"), directed=False, _canonical=True)


def disjoint_graphs(spark: SparkSession, graphs: list[Graph]) -> Graph:
    """igraph_disjoint_union (operators.c:71): shift ids, concat."""
    from igraph_spark.operators.setops import disjoint_union
    g = graphs[0]
    for h in graphs[1:]:
        g = disjoint_union(g, h)
    return g


def _vl_connected_sample(degs, seed: int) -> list:
    """Viger-Latapy connected simple-graph sampler (driver core).

    The reference pipeline (/root/reference/src/gengraph_mr-connected.cpp
    :30-80, igraph_degree_sequence_game_vl): realize the sequence as a
    simple graph, merge components with degree-preserving swaps
    (graph_molloy_opt::make_connected), then mix with ~5m double-edge
    swaps, keeping connectivity via Gkantsidis-style windows
    (gengraph_graph_molloy_hash.cpp shuffle heuristics): apply a window
    of K blind swaps, test connectivity once, revert the window and
    halve K on failure, grow K on success.

    Driver-gated by the caller — the sampler is inherently sequential
    (each swap's validity depends on the full current edge set), the
    same shape as the reference's own single-threaded gengraph.  PRNG
    is numpy's seeded generator (documented deviation, same policy as
    SIR/forest-fire).  Returns a list of (src, dst) with src < dst.
    """
    import numpy as np
    degs = np.asarray(degs, dtype=np.int64)
    n = len(degs)
    if (degs < 0).any():
        raise ValueError("degrees must be non-negative")
    if int(degs.sum()) % 2:
        raise ValueError("sum(degrees) must be even")
    if n and (degs == 0).any():
        raise ValueError(
            "method='vl' requires every degree >= 1 (a zero-degree "
            "vertex cannot join the connected graph; the reference's "
            "make_connected step fails the same way)")
    m = int(degs.sum()) // 2
    if n and m < n - 1:
        raise ValueError(
            f"sum(degrees)/2 = {m} < n-1 = {n - 1}: no connected graph "
            f"realizes this sequence")
    if n == 0:
        return []

    # --- Havel-Hakimi realization (simple, deterministic) -------------
    import heapq
    heap = [(-int(d), i) for i, d in enumerate(degs)]
    heapq.heapify(heap)
    adj: dict[int, set] = {i: set() for i in range(n)}
    edges: set = set()
    while heap:
        d, v = heapq.heappop(heap)
        d = -d
        if d == 0:
            continue
        grabbed = []
        while len(grabbed) < d:
            if not heap:
                raise ValueError("degree sequence is not graphical")
            du, u = heapq.heappop(heap)
            grabbed.append((-du, u))
        for du, u in grabbed:
            if du == 0:
                raise ValueError("degree sequence is not graphical")
            a, b = (v, u) if v < u else (u, v)
            edges.add((a, b))
            adj[v].add(u)
            adj[u].add(v)
            if du - 1 > 0:
                heapq.heappush(heap, (-(du - 1), u))

    rng = np.random.default_rng(seed)

    def components() -> list:
        comp = [-1] * n
        out = []
        for s in range(n):
            if comp[s] != -1:
                continue
            stack, members = [s], [s]
            comp[s] = s
            while stack:
                x = stack.pop()
                for y in adj[x]:
                    if comp[y] == -1:
                        comp[y] = s
                        stack.append(y)
                        members.append(y)
            out.append(members)
        return out

    def is_connected() -> bool:
        seen = bytearray(n)
        stack = [0]
        seen[0] = 1
        cnt = 1
        while stack:
            x = stack.pop()
            for y in adj[x]:
                if not seen[y]:
                    seen[y] = 1
                    cnt += 1
                    stack.append(y)
        return cnt == n

    def drop(a, b):
        edges.discard((a, b) if a < b else (b, a))
        adj[a].discard(b)
        adj[b].discard(a)

    def put(a, b):
        edges.add((a, b) if a < b else (b, a))
        adj[a].add(b)
        adj[b].add(a)

    # --- make_connected: cross-component swaps ------------------------
    comps = sorted(components(), key=len, reverse=True)
    for small in comps[1:]:
        # any edge of the small component x any edge of the (growing)
        # giant: endpoints are disjoint across components, so the swap
        # (a,b),(c,d) -> (a,c),(b,d) can never create a loop or
        # multi-edge — it always merges the two components
        a = small[0]
        b = next(iter(adj[a]))
        giant = set(comps[0])
        c = d = -1
        for (c, d) in edges:
            if c in giant:
                break
        drop(a, b)
        drop(c, d)
        put(a, c)
        put(b, d)
        comps[0].extend(small)

    # --- shuffle: 5m swaps in Gkantsidis windows ----------------------
    target = 5 * m
    done = 0
    K = max(1, m // 8)
    budget = 50 * target  # hard bound on attempts incl. reverted windows
    elist = list(edges)
    while done < target and budget > 0:
        w = min(K, target - done)
        undo = []
        for _ in range(w):
            budget -= 1
            i = int(rng.integers(0, len(elist)))
            j = int(rng.integers(0, len(elist)))
            if i == j:
                continue
            u, v = elist[i]
            x, y = elist[j]
            if int(rng.integers(0, 2)):
                x, y = y, x
            # (u,v),(x,y) -> (u,y),(x,v)
            if u == y or x == v:
                continue
            e1 = (u, y) if u < y else (y, u)
            e2 = (x, v) if x < v else (v, x)
            if e1 in edges or e2 in edges:
                continue
            drop(u, v)
            drop(x, y)
            put(*e1)
            put(*e2)
            elist[i], elist[j] = e1, e2
            undo.append((i, j, (u, v), (x, y), e1, e2))
        if is_connected():
            done += w
            K += max(1, K // 10)
        else:
            for i, j, old1, old2, e1, e2 in reversed(undo):
                drop(*e1)
                drop(*e2)
                put(*old1)
                put(*old2)
                elist[i], elist[j] = (tuple(sorted(old1)),
                                      tuple(sorted(old2)))
            K = max(1, K // 2)
    return sorted(edges)


def degree_sequence_game(spark: SparkSession, out_deg, in_deg=None,
                         seed: int = 42, method: str = "configuration",
                         max_repair_rounds: int = 30) -> Graph:
    """igraph_degree_sequence_game analog (/root/reference/src/games.c
    degree-sequence methods): generate a graph with EXACTLY the given
    degree sequence.

    ``method='configuration'``: the stub-pairing configuration model —
    each vertex contributes ``deg`` stubs, stubs get a seeded-hash
    draw, the globally ranked stub list is paired (2i, 2i+1)
    (undirected) or out-rank i ↔ in-rank i (directed).  Loops and
    multi-edges may appear, like igraph's IGRAPH_DEGSEQ_CONFIGURATION.

    ``method='simple'`` (undirected only): configuration pairing, then
    deterministic degree-preserving double-edge-swap repair rounds that
    eliminate loops/multi-edges (igraph's FAST_HEUR_SIMPLE analog) —
    the degree sequence stays exact; raises if the repair does not
    converge (sequence near-non-graphical).

    The global stub ranking is a distributed sort + per-partition
    offset index (``zipWithIndex``) — one O(m log m) range-partitioned
    pass, the same shuffle budget as any keyed exchange, so the
    construction holds at 10^9 stubs.
    """
    if isinstance(out_deg, (list, tuple)):
        out_df = spark.createDataFrame(
            [(i, int(d)) for i, d in enumerate(out_deg)],
            "id long, deg long")
    else:
        out_df = out_deg.select("id", F.col("deg").cast("long"))
    directed = in_deg is not None

    def _ranked_stubs(deg_df, salt: int):
        stubs = (deg_df.where(F.col("deg") > 0)
                 .select("id", F.explode(F.sequence(
                     F.lit(0), (F.col("deg") - 1).cast("int"))).alias("k"))
                 .select("id", F.xxhash64(F.lit(seed), F.lit(salt),
                                          "id", "k").alias("h")))
        return (stubs.orderBy("h", "id").rdd.zipWithIndex()
                .map(lambda t: (t[0]["id"], t[1]))
                .toDF("id long, r long"))

    if directed:
        if method == "vl":
            raise ValueError("method='vl' requires an undirected degree "
                             "sequence (games.c:1267-1277)")
        if isinstance(in_deg, (list, tuple)):
            in_df = spark.createDataFrame(
                [(i, int(d)) for i, d in enumerate(in_deg)],
                "id long, deg long")
        else:
            in_df = in_deg.select("id", F.col("deg").cast("long"))
        n_out = out_df.agg(F.sum("deg")).first()[0] or 0
        n_in = in_df.agg(F.sum("deg")).first()[0] or 0
        if n_out != n_in:
            raise ValueError("sum(out_deg) != sum(in_deg)")
        e = (_ranked_stubs(out_df, 0).withColumnRenamed("id", "src")
             .join(_ranked_stubs(in_df, 1).withColumnRenamed("id", "dst"),
                   "r").select("src", "dst"))
        verts = out_df.select("id").unionByName(
            in_df.select("id")).distinct()
        return Graph(e, verts, directed=True)

    total = out_df.agg(F.sum("deg")).first()[0] or 0
    if total % 2:
        raise ValueError("sum(degrees) must be even")
    if method == "vl":
        # Viger-Latapy connected sampler — driver-gated (the swap-MCMC
        # core is inherently sequential, like the reference's gengraph);
        # at corpus scale use method='simple' + explicit connectivity
        # handling instead
        if total > 2_000_000:
            raise ValueError(
                f"method='vl' is driver-gated at 2M stubs (got {total}); "
                f"use method='simple' for the distributed path")
        rows = out_df.orderBy("id").collect()
        ids = [r["id"] for r in rows]
        vl_edges = _vl_connected_sample([r["deg"] for r in rows], seed)
        e = spark.createDataFrame(
            [(ids[a], ids[b]) for a, b in vl_edges] or [],
            "src long, dst long")
        return Graph(e, out_df.select("id"), directed=False)
    ranked = _ranked_stubs(out_df, 0)
    half = ranked.select("id", (F.col("r") / 2).cast("long").alias("p"),
                         (F.col("r") % 2).alias("side"))
    e = (half.where(F.col("side") == 0).select(F.col("id").alias("src"), "p")
         .join(half.where(F.col("side") == 1)
               .select(F.col("id").alias("dst"), "p"), "p")
         .select("src", "dst"))
    verts = out_df.select("id")
    if method == "configuration":
        return Graph(e, verts, directed=False)
    if method != "simple":
        raise ValueError(f"unknown method {method!r}")

    # simple: repair loops/multi-edges by deterministic double swaps.
    # Each round: canonicalize, mark bad rows (loops + duplicate-rank
    # >0 copies), pair every bad row with a partner edge in a seeded
    # hash bucket, swap endpoints (u1,v1),(u2,v2) -> (u1,v2),(u2,v1).
    # Degrees are invariant under the swap; bad-row count shrinks
    # geometrically (verified by the convergence check below).
    from pyspark.sql import Window
    cur = e
    for rnd in range(max_repair_rounds):
        c = cur.select(F.least("src", "dst").alias("src"),
                       F.greatest("src", "dst").alias("dst"))
        w = Window.partitionBy("src", "dst").orderBy(F.lit(1))
        marked = c.select(
            "src", "dst",
            ((F.row_number().over(w) > 1) | (F.col("src") == F.col("dst")))
            .alias("bad")).persist()
        n_bad = marked.where("bad").count()
        if n_bad == 0:
            marked.unpersist()
            return Graph(c, verts, directed=False)
        nb = max(1, n_bad)
        bucketed = marked.select(
            "src", "dst", "bad",
            F.pmod(F.xxhash64(F.lit(seed), F.lit(rnd + 1), "src", "dst"),
                   F.lit(2 * nb)).alias("b"),
            F.xxhash64(F.lit(seed), F.lit(-rnd - 1), "src", "dst")
            .alias("h"))
        bw = Window.partitionBy("b").orderBy(
            F.col("bad").desc(), "h", "src", "dst")
        ranked2 = bucketed.select(
            "src", "dst", "bad", "b", F.row_number().over(bw).alias("rk"))
        pairs = ranked2.where(F.col("rk") <= 2)
        rest = ranked2.where(F.col("rk") > 2).select("src", "dst")
        first = pairs.where(F.col("rk") == 1).select(
            "b", F.col("src").alias("u1"), F.col("dst").alias("v1"),
            F.col("bad").alias("bad1"))
        second = pairs.where(F.col("rk") == 2).select(
            "b", F.col("src").alias("u2"), F.col("dst").alias("v2"))
        joined = first.join(second, "b", "left")
        swapped = joined.select(
            F.when(F.col("bad1") & F.col("u2").isNotNull(),
                   F.struct(F.col("u1").alias("src"),
                            F.col("v2").alias("dst")))
            .otherwise(F.struct(F.col("u1").alias("src"),
                                F.col("v1").alias("dst"))).alias("e1"),
            F.when(F.col("bad1") & F.col("u2").isNotNull(),
                   F.struct(F.col("u2").alias("src"),
                            F.col("v1").alias("dst")))
            .otherwise(F.struct(F.col("u2").alias("src"),
                                F.col("v2").alias("dst"))).alias("e2"))
        cur = (swapped.select(F.col("e1.src").alias("src"),
                              F.col("e1.dst").alias("dst"))
               .unionByName(
                   swapped.where(F.col("e2.src").isNotNull())
                   .select(F.col("e2.src").alias("src"),
                           F.col("e2.dst").alias("dst")))
               .unionByName(rest))
        cur = cur.localCheckpoint()
        marked.unpersist()
    raise RuntimeError(
        f"degree_sequence_game(method='simple') did not reach a simple "
        f"graph in {max_repair_rounds} repair rounds")


def rewire(graph: Graph, n_rounds: int = 10, seed: int = 42) -> Graph:
    """igraph_rewire analog (/root/reference/src/games.c rewiring):
    degree-preserving randomization by double edge swaps, keeping the
    graph simple.

    Each round pairs edges inside seeded hash buckets (keyed window —
    no global sort) and swaps endpoints (u1,v1),(u2,v2) ->
    (u1,v2),(u2,v1).  A swap is rejected when it would create a loop,
    a duplicate inside the pair, an edge already present (anti-check
    against the distinct current edge set), or the same new edge as a
    swap in another bucket this round (cross-bucket collision
    aggregation) — so the graph stays simple and the degree sequence
    exact by construction.  Deterministic at any parallelism; every
    round is O(m) keyed shuffle, like one BSP superstep.
    """
    from pyspark.sql import Window
    directed = graph.directed
    cur = graph.edges.select("src", "dst")
    m = cur.count()
    if m < 2:
        return graph
    nb = max(1, m // 2)

    def canon(df, a="src", b="dst"):
        if directed:
            return df.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        return df.select(F.least(a, b).alias("src"),
                         F.greatest(a, b).alias("dst"))

    for rnd in range(n_rounds):
        bucketed = cur.select(
            "src", "dst",
            F.pmod(F.xxhash64(F.lit(seed), F.lit(rnd), "src", "dst"),
                   F.lit(nb)).alias("b"),
            F.xxhash64(F.lit(seed), F.lit(-rnd - 1), "src", "dst")
            .alias("h"))
        w = Window.partitionBy("b").orderBy("h", "src", "dst")
        r = bucketed.select("src", "dst", "b",
                            F.row_number().over(w).alias("rk"))
        rest = r.where(F.col("rk") > 2).select("src", "dst")
        first = r.where(F.col("rk") == 1).select(
            "b", F.col("src").alias("u1"), F.col("dst").alias("v1"))
        second = r.where(F.col("rk") == 2).select(
            "b", F.col("src").alias("u2"), F.col("dst").alias("v2"))
        j = first.join(second, "b", "left").persist()
        lone = (j.where(F.col("u2").isNull())
                .select(F.col("u1").alias("src"), F.col("v1").alias("dst")))
        # candidate new endpoints, canonicalized inline
        ns1 = (F.least("u1", "v2") if not directed else F.col("u1"))
        nd1 = (F.greatest("u1", "v2") if not directed else F.col("v2"))
        ns2 = (F.least("u2", "v1") if not directed else F.col("u2"))
        nd2 = (F.greatest("u2", "v1") if not directed else F.col("v1"))
        cand = j.where(F.col("u2").isNotNull()).select(
            "b", "u1", "v1", "u2", "v2",
            ns1.alias("ns1"), nd1.alias("nd1"),
            ns2.alias("ns2"), nd2.alias("nd2"))
        bad = (
            (F.col("ns1") == F.col("nd1")) | (F.col("ns2") == F.col("nd2"))
            | ((F.col("ns1") == F.col("ns2"))
               & (F.col("nd1") == F.col("nd2"))))
        ex = canon(cur).distinct()
        ex1 = ex.select(F.col("src").alias("ns1"), F.col("dst").alias("nd1"),
                        F.lit(True).alias("x1"))
        ex2 = ex.select(F.col("src").alias("ns2"), F.col("dst").alias("nd2"),
                        F.lit(True).alias("x2"))
        cand = (cand.join(ex1, ["ns1", "nd1"], "left")
                .join(ex2, ["ns2", "nd2"], "left")
                .withColumn("reject", bad | F.col("x1").isNotNull()
                            | F.col("x2").isNotNull())
                .persist())
        # cross-bucket collisions: two accepted swaps proposing the
        # same new edge would create a multi-edge — reject those
        # buckets too (keep none: deterministic and degree-safe).
        acc = cand.where(~F.col("reject"))
        newe = (acc.select("b", F.col("ns1").alias("s"),
                           F.col("nd1").alias("d"))
                .unionByName(acc.select("b", F.col("ns2").alias("s"),
                                        F.col("nd2").alias("d"))))
        dup_edges = (newe.groupBy("s", "d").count().where("count > 1")
                     .select("s", "d"))
        dup_buckets = (newe.join(dup_edges, ["s", "d"], "left_semi")
                       .select("b").distinct()
                       .withColumn("coll", F.lit(True)))
        cand2 = (cand.join(dup_buckets, "b", "left")
                 .withColumn("rej", F.col("reject")
                             | F.col("coll").isNotNull()))
        swapped = cand2.select(
            F.when(F.col("rej"), F.struct(F.col("u1").alias("src"),
                                          F.col("v1").alias("dst")))
            .otherwise(F.struct(F.col("ns1").alias("src"),
                                F.col("nd1").alias("dst"))).alias("e1"),
            F.when(F.col("rej"), F.struct(F.col("u2").alias("src"),
                                          F.col("v2").alias("dst")))
            .otherwise(F.struct(F.col("ns2").alias("src"),
                                F.col("nd2").alias("dst"))).alias("e2"))
        cur = (swapped.select("e1.src", "e1.dst")
               .unionByName(swapped.select(F.col("e2.src").alias("src"),
                                           F.col("e2.dst").alias("dst")))
               .unionByName(rest).unionByName(lone)
               .localCheckpoint())
        j.unpersist()
        cand.unpersist()
    return Graph(cur, graph.vertices, directed=directed)


def full_citation(spark: SparkSession, n: int) -> Graph:
    """igraph_full_citation (structure_generators.c:1078): directed
    edges i -> j for every j < i."""
    a = spark.range(n).toDF("src")
    b = spark.range(n).toDF("dst")
    e = a.crossJoin(b).where("dst < src")
    return Graph(e, spark.range(n).toDF("id"), directed=True)


def preference_game(spark: SparkSession, n: int, types: int,
                    type_dist: list[float] | None = None,
                    pref_matrix: list[list[float]] | None = None,
                    seed: int = 42, directed: bool = False) -> Graph:
    """igraph_preference_game (games.c:2209): vertices get types by
    ``type_dist`` fractions (deterministic: cumulative quantile of the
    vertex index — same marginal, reproducible), pair (i, j) becomes an
    edge with probability pref_matrix[type_i][type_j].  Hash-
    thresholded O(n^2) candidate space like sbm — fixture scale; the
    sparse path is gnm per type-block pair.  Returns a graph whose
    vertices DataFrame carries a ``type`` column."""
    if type_dist is None:
        type_dist = [1.0 / types] * types
    if pref_matrix is None:
        pref_matrix = [[0.5 if i == j else 0.1 for j in range(types)]
                       for i in range(types)]
    tot = sum(type_dist)
    cum, acc = [], 0.0
    for frac in type_dist:
        acc += frac / tot
        cum.append(acc)
    tcol = F.lit(types - 1)
    for k in range(types - 2, -1, -1):
        tcol = F.when((F.col("id") + 1) / n <= cum[k] + 1e-12,
                      k).otherwise(tcol)
    verts = spark.range(n).select("id", tcol.cast("int").alias("type"))
    a = verts.select(F.col("id").alias("src"),
                     F.col("type").alias("ta"))
    b = verts.select(F.col("id").alias("dst"),
                     F.col("type").alias("tb"))
    pairs = a.crossJoin(b)
    pairs = pairs.where("src != dst") if directed else \
        pairs.where("src < dst")
    p = F.lit(0.0)
    for i in range(types):
        for j in range(types):
            p = F.when((F.col("ta") == i) & (F.col("tb") == j),
                       F.lit(float(pref_matrix[i][j]))).otherwise(p)
    u = _u01(F.col("src") * n + F.col("dst"), seed, 11)
    e = pairs.where(u < p).select("src", "dst")
    return Graph(e, verts, directed=directed, _canonical=not directed)


def islands(spark: SparkSession, islands_n: int, islands_size: int,
            p_in: float, n_inter: int, seed: int = 42) -> Graph:
    """igraph_simple_interconnected_islands_game (games.c:3345):
    ``islands_n`` G(size, p_in) islands plus ``n_inter`` hash-chosen
    inter-island edges per island pair."""
    n = islands_n * islands_size
    a = spark.range(n).toDF("src")
    b = spark.range(n).toDF("dst")
    pairs = a.crossJoin(b).where("src < dst")
    isl = lambda c: (F.col(c) / islands_size).cast("long")  # noqa: E731
    u = _u01(F.col("src") * n + F.col("dst"), seed, 13)
    intra = pairs.where((isl("src") == isl("dst")) & (u < p_in))
    # per island pair, the n_inter smallest hash draws become edges
    from pyspark.sql import Window
    inter_c = pairs.where(isl("src") != isl("dst")).select(
        "src", "dst", u.alias("u"), isl("src").alias("ia"),
        isl("dst").alias("ib"))
    w = Window.partitionBy("ia", "ib").orderBy("u", "src", "dst")
    inter = (inter_c.select("src", "dst",
                            F.row_number().over(w).alias("rk"))
             .where(F.col("rk") <= n_inter).select("src", "dst"))
    e = intra.unionByName(inter)
    return Graph(e, spark.range(n).toDF("id"), directed=False,
                 _canonical=True)


def lattice(spark: SparkSession, dims: list[int], directed: bool = False,
            mutual: bool = False, circular: bool = False) -> Graph:
    """igraph_lattice (structure_generators.c:743), nei=1: N-dimensional
    rectangular lattice.  Vertex numbering is mixed-radix with the
    FIRST dimension varying fastest (stride of dim j = product of the
    preceding dims, matching the reference's ``weights``); ``circular``
    wraps each dimension (skipping the duplicate wrap edge when a
    dimension has size 2 and the graph is undirected — the reference's
    own guard), ``mutual`` adds reverse arcs to a directed lattice.

    Pure column algebra over ``spark.range(prod(dims))`` — one
    filtered projection per dimension, no driver loops over vertices,
    so a 10^9-vertex lattice materializes as D narrow scans."""
    n = 1
    for s in dims:
        if s < 0:
            raise ValueError("dimension sizes must be >= 0")
        n *= int(s)
    ids = spark.range(n)
    parts = []
    w = 1
    for s in (int(x) for x in dims):
        if s > 1:
            coord = (F.col("id") / w).cast("long") % s
            parts.append(ids.where(coord < s - 1).select(
                F.col("id").alias("src"),
                (F.col("id") + w).alias("dst")))
            if circular and s > 2 or (circular and s == 2 and directed):
                parts.append(ids.where(coord == s - 1).select(
                    F.col("id").alias("src"),
                    (F.col("id") - (s - 1) * w).alias("dst")))
        w *= max(s, 1)
    if not parts:
        e = spark.createDataFrame([], "src long, dst long")
    else:
        e = parts[0]
        for p in parts[1:]:
            e = e.unionByName(p)
    if directed and mutual:
        e = e.unionByName(e.select(F.col("dst").alias("src"),
                                   F.col("src").alias("dst")))
    return Graph(e, spark.range(n).toDF("id"), directed=directed)


# --------------------------------------------------- latent-vector samplers
# Reference /root/reference/src/dotproduct.c:120-276.  Columns, not an
# igraph_matrix_t: one row per sample -> DataFrame(id, vec array<double>).
# Gaussians come from hash-uniform pairs via Box-Muller, so every sampler
# is deterministic at any parallelism.

def _normal_cols(idc: F.Column, seed: int, dim: int) -> list:
    """dim iid N(0,1) columns keyed on (seed, id) via Box-Muller."""
    import math
    out = []
    for j in range(0, dim, 2):
        u1 = _u01(idc, seed, 100 + j)
        u2 = _u01(idc, seed, 101 + j)
        # keep u1 away from 0 so log() is finite
        u1 = F.greatest(u1, F.lit(1e-300))
        r = F.sqrt(-2.0 * F.log(u1))
        out.append(r * F.cos(F.lit(2.0 * math.pi) * u2))
        if j + 1 < dim:
            out.append(r * F.sin(F.lit(2.0 * math.pi) * u2))
    return out[:dim]


def sample_sphere_surface(spark: SparkSession, dim: int, n: int,
                          radius: float = 1.0, positive: bool = False,
                          seed: int = 42) -> "DataFrame":
    """igraph_sample_sphere_surface (dotproduct.c:132): n points uniform
    on the dim-sphere surface (normalized Gaussians) ->
    DataFrame(id, vec).  Fully columnar; O(n*dim) with no shuffle."""
    if dim < 2:
        raise ValueError("sphere must be at least two dimensional")
    if radius <= 0:
        raise ValueError("radius must be positive")
    g = _normal_cols(F.col("id"), seed, dim)
    norm = F.sqrt(sum((c * c for c in g[1:]), g[0] * g[0]))
    comps = [F.lit(radius) * c / norm for c in g]
    if positive:
        comps = [F.abs(c) for c in comps]
    return spark.range(n).select("id", F.array(*comps).alias("vec"))


def sample_sphere_volume(spark: SparkSession, dim: int, n: int,
                         radius: float = 1.0, positive: bool = False,
                         seed: int = 42) -> "DataFrame":
    """igraph_sample_sphere_volume (dotproduct.c:199): surface sample
    scaled by U^(1/dim)."""
    surf = sample_sphere_surface(spark, dim, n, radius, positive, seed)
    u = F.pow(_u01(F.col("id"), seed, 999), 1.0 / dim)
    return surf.select(
        "id", F.transform("vec", lambda c: c * u).alias("vec"))


def sample_dirichlet(spark: SparkSession, n: int, alpha: list,
                     seed: int = 42) -> "DataFrame":
    """igraph_sample_dirichlet (dotproduct.c:222): normalized Gamma(a_j)
    draws.  Gamma via Marsaglia-Tsang in a vectorized Arrow batch UDF
    (numpy, no per-row Python objects); each row's generator is keyed on
    (seed, id) so the sample is independent of partitioning."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    alpha = [float(a) for a in alpha]
    if len(alpha) < 2:
        raise ValueError("alpha must have at least two entries")
    if min(alpha) <= 0:
        raise ValueError("alpha entries must be positive")
    alph = np.asarray(alpha)

    @pandas_udf("array<double>")
    def _dir(ids: pd.Series) -> pd.Series:
        rows = []
        for i in ids.to_numpy():
            rng = np.random.Generator(np.random.PCG64(
                (int(i) * 1000003 + seed) & 0x7FFFFFFFFFFFFFFF))
            g = rng.gamma(alph)
            rows.append((g / g.sum()).tolist())
        return pd.Series(rows)

    return spark.range(n).select("id", _dir("id").alias("vec"))


def dot_product_game(vecs: "DataFrame", directed: bool = False,
                     seed: int = 42) -> Graph:
    """igraph_dot_product_game (/root/reference/src/dotproduct.c:60):
    vertices carry latent vectors; P(edge i->j) = <v_i, v_j>, clamped to
    [0,1] (reference: prob>1 always adds the edge, prob<0 never).

    ``vecs`` is DataFrame(id, vec array<double>) — one row per vertex
    (e.g. from sample_sphere_volume / sample_dirichlet).  The O(n^2)
    candidate cross-join matches the reference's own complexity; at
    scale, pre-bucket by an LSH of the latent vector and join buckets
    (the rhp machinery in functions/ann.py) instead of the full cross.
    Deterministic: the coin for pair (i,j) is xxhash64(seed, i, j)."""
    a = vecs.select(F.col("id").alias("src"), F.col("vec").alias("va"))
    b = vecs.select(F.col("id").alias("dst"), F.col("vec").alias("vb"))
    pairs = a.crossJoin(b).where(
        F.col("src") != F.col("dst") if directed
        else F.col("src") < F.col("dst"))
    prob = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x)
    h = F.xxhash64(F.col("src"), F.col("dst"), F.lit(seed))
    u = (h.cast("double") / F.lit(2.0 ** 64)) + F.lit(0.5)
    e = (pairs.withColumn("p", prob)
         .where((F.col("p") >= 1.0) | (u < F.col("p")))
         .select("src", "dst"))
    return Graph(e, vecs.select("id"), directed=directed,
                 _canonical=not directed)


def forest_fire_game(spark: SparkSession, nodes: int, fw_prob: float,
                     bw_factor: float = 1.0, ambs: int = 1,
                     directed: bool = True, seed: int = 42,
                     max_driver_nodes: int = 200_000) -> Graph:
    """Forest fire model (/root/reference/src/forestfire.c:106,
    Leskovec-Kleinberg-Faloutsos corrected version): vertex t picks
    ``ambs`` uniform ambassadors among 0..t-1 and recursively burns
    Geometric(1-p) outgoing / Geometric(1-r*p) incoming unvisited
    neighbors of each burned vertex.

    Growth is SEQUENTIAL BY DEFINITION — vertex t's burn depends on the
    full graph built by vertices < t — so like the reference this runs
    as a driver core (guarded by ``max_driver_nodes``); there is no
    semantics-preserving distributed formulation.  Randomness is a
    per-vertex PCG64 keyed on (seed, t): the sample is independent of
    Spark parallelism and reproducible.  The RESULT is returned as a
    distributed edge DataFrame for downstream analytics at any scale.
    """
    import numpy as np

    if fw_prob < 0 or bw_factor < 0 or ambs < 0:
        raise ValueError("fw_prob, bw_factor and ambs must be non-negative")
    if nodes > max_driver_nodes:
        raise ValueError(
            f"forest fire is a sequential growth model: {nodes} nodes > "
            f"max_driver_nodes={max_driver_nodes}")
    verts = spark.range(nodes).toDF("id")
    if fw_prob == 0 or ambs == 0 or nodes <= 1:
        e = spark.createDataFrame([], "src long, dst long")
        return Graph(e, verts, directed=directed, _canonical=True)

    p_out = 1.0 - fw_prob                  # RNG_GEOM(1-p): mean p/(1-p)
    p_in = 1.0 - fw_prob * bw_factor
    outneis = [[] for _ in range(nodes)]
    inneis = [[] for _ in range(nodes)]
    visited = np.zeros(nodes, dtype=np.int64)
    edges = []
    for t in range(1, nodes):
        rng = np.random.Generator(np.random.PCG64(
            (t * 2654435761 + seed) & 0x7FFFFFFFFFFFFFFF))
        visited[t] = t + 1
        queue = []

        def burn(nei):
            if visited[nei] != t + 1:
                visited[nei] = t + 1
                queue.append(nei)
                edges.append((t, nei))
                outneis[t].append(nei)
                inneis[nei].append(t)

        for _ in range(ambs):
            burn(int(rng.integers(0, t)))
        qi = 0
        while qi < len(queue):
            amb = queue[qi]
            qi += 1
            outs, ins = outneis[amb], inneis[amb]
            # numpy geometric counts failures+1; igraph's RNG_GEOM(q)
            # counts failures before first success with success prob q
            neis_out = int(rng.geometric(p_out)) - 1 if p_out < 1 else 0
            neis_in = int(rng.geometric(p_in)) - 1 if p_in < 1 else 0
            for neis, pool in ((neis_out, outs), (neis_in, ins)):
                if neis >= len(pool):
                    for nei in list(pool):
                        burn(nei)
                else:
                    left = len(pool)
                    got = 0
                    while got < neis and left > 0:
                        which = int(rng.integers(0, left))
                        nei = pool[which]
                        pool[which], pool[left - 1] = pool[left - 1], nei
                        if visited[nei] != t + 1:
                            burn(nei)
                            got += 1
                        left -= 1
    e = spark.createDataFrame(edges, "src long, dst long")
    if not directed:
        e = e.select(F.least("src", "dst").alias("src"),
                     F.greatest("src", "dst").alias("dst"))
    return Graph(e, verts, directed=directed, _canonical=True)


def static_fitness_game(spark: SparkSession, fitness_out,
                        fitness_in=None, m: int = 0,
                        loops: bool = False, multiple: bool = False,
                        seed: int = 42) -> Graph:
    """igraph_static_fitness_game (games.c:3523): m edges whose
    endpoints are drawn independently with probability proportional to
    per-vertex fitness (out-fitness for sources, in-fitness for
    destinations; undirected when ``fitness_in`` is None).

    Sampling is the reference's inverse-CDF on the cumulative fitness
    vector, made deterministic at any parallelism: edge slot i draws
    u = u01(xxhash64(i)) and lands on the vertex whose cumulative
    interval contains u * total (vectorized searchsorted in an Arrow
    pandas_udf — no per-row Python).  With ``multiple=False`` the
    sample is oversized, loops/duplicates dropped, and the m smallest
    surviving slot ids kept (same selection discipline as gnm).

    The cumulative vector is driver-resident (one float per vertex,
    gated at 2^24 vertices); beyond that a bucketed interval index is
    the scale path — the DRAW itself is already fully distributed.
    """
    import numpy as np

    f_out = np.asarray(list(fitness_out), dtype=np.float64)
    n = len(f_out)
    if n == 0 or m <= 0:
        return Graph(spark.createDataFrame([], "src long, dst long"),
                     spark.range(n).toDF("id"),
                     directed=fitness_in is not None)
    if n > (1 << 24):
        raise NotImplementedError(
            "static_fitness_game: cumulative vector gated at 2^24 "
            "vertices; use a bucketed interval index beyond")
    if f_out.min() < 0:
        raise ValueError("fitness scores must be non-negative")
    directed = fitness_in is not None
    cum_out = np.cumsum(f_out)
    if directed:
        f_in = np.asarray(list(fitness_in), dtype=np.float64)
        if len(f_in) != n:
            raise ValueError("fitness_in length mismatch")
        if f_in.min() < 0:
            raise ValueError("fitness scores must be non-negative")
        cum_in = np.cumsum(f_in)
    else:
        cum_in = cum_out
    tot_out, tot_in = float(cum_out[-1]), float(cum_in[-1])
    if tot_out <= 0 or tot_in <= 0:
        raise ValueError("at least one positive fitness score required")

    @F.pandas_udf("long")
    def _pick_src(u: pd.Series) -> pd.Series:
        import numpy as _np
        return pd.Series(_np.searchsorted(
            cum_out, u.to_numpy() * tot_out, side="right"))

    @F.pandas_udf("long")
    def _pick_dst(u: pd.Series) -> pd.Series:
        import numpy as _np
        return pd.Series(_np.searchsorted(
            cum_in, u.to_numpy() * tot_in, side="right"))

    def _draw(over: int):
        base = spark.range(over)
        return base.select(
            "id",
            _pick_src(_u01(F.col("id"), seed, 41)).alias("src"),
            _pick_dst(_u01(F.col("id"), seed, 43)).alias("dst"))

    if multiple:
        cand = _draw(m)
        if not loops:
            # igraph redraws colliding pairs; the deterministic analog
            # re-salts rejected slots in rounds until loop-free
            for salt in range(45, 77, 2):
                bad = cand.where("src = dst")
                if bad.isEmpty():
                    break
                cand = cand.where("src != dst").unionByName(
                    bad.select(
                        "id",
                        _pick_src(_u01(F.col("id"), seed, salt)).alias("src"),
                        _pick_dst(_u01(F.col("id"), seed,
                                       salt + 1)).alias("dst")))
        e = cand.select("src", "dst")
        if not directed:
            e = e.select(F.least("src", "dst").alias("src"),
                         F.greatest("src", "dst").alias("dst"))
        return Graph(e, spark.range(n).toDF("id"), directed=directed,
                     _canonical=False)

    over = int(m * 1.25) + 16
    for _attempt in range(8):
        cand = _draw(over)
        if not loops:
            cand = cand.where("src != dst")
        if not directed:
            cand = cand.select("id", F.least("src", "dst").alias("src"),
                               F.greatest("src", "dst").alias("dst"))
        surv = cand.groupBy("src", "dst").agg(F.min("id").alias("id"))
        bw = max(1, over // 4096)
        hist = (surv.groupBy((F.col("id") / bw).cast("long").alias("b"))
                .count().orderBy("b").collect())
        total, cut_b, k_in_cut = 0, None, 0
        for r in hist:
            if total + r["count"] >= m:
                cut_b, k_in_cut = int(r["b"]), m - total
                break
            total += int(r["count"])
        if cut_b is None:
            over *= 2
            continue
        below = surv.where(F.col("id") < cut_b * bw)
        incut = (surv.where((F.col("id") >= cut_b * bw)
                            & (F.col("id") < (cut_b + 1) * bw))
                 .orderBy("id").limit(k_in_cut))
        e = below.unionByName(incut).select("src", "dst")
        return Graph(e, spark.range(n).toDF("id"), directed=directed,
                     _canonical=not directed)
    raise ValueError(f"static_fitness_game: could not draw {m} edges "
                     f"after oversampling to {over}")


def static_power_law_game(spark: SparkSession, n: int, m: int,
                          exponent_out: float, exponent_in: float = -1.0,
                          loops: bool = False, multiple: bool = False,
                          finite_size_correction: bool = False,
                          seed: int = 42) -> Graph:
    """igraph_static_power_law_game (games.c:3747): static_fitness_game
    with fitness_out[i] = j^alpha, alpha = -1/(exponent-1), j counting
    down from n (+ the Cho et al finite-size shift when alpha < -0.5,
    clamped to j >= n exactly as the reference does at games.c:3779).
    ``exponent_in < 0`` -> undirected; otherwise the in-fitness vector
    is permuted to decorrelate in/out degree (the reference shuffles
    with its own RNG, games.c:3807; here it is a numpy seeded-generator
    permutation — documented PRNG deviation, same policy as SIR/
    Moran)."""
    import math

    import numpy as np

    def _fitness(exponent: float) -> "np.ndarray":
        if exponent < 2:
            raise ValueError("degree exponent must be >= 2")
        alpha = 0.0 if math.isinf(exponent) else -1.0 / (exponent - 1.0)
        j0 = float(n)
        if finite_size_correction and alpha < -0.5:
            j0 += (n ** (1 + 0.5 / alpha)
                   * (10 * math.sqrt(2) * (1 + alpha)) ** (-1.0 / alpha)
                   - 1)
        j0 = max(j0, float(n))
        return np.power(j0 - np.arange(n, dtype=np.float64), alpha)

    f_out = _fitness(exponent_out)
    if exponent_in < 0:
        return static_fitness_game(spark, f_out, None, m, loops=loops,
                                   multiple=multiple, seed=seed)
    f_in = _fitness(exponent_in)
    # deterministic decorrelating permutation: numpy's seeded generator
    # (the reference shuffles in-fitness with its own RNG -- documented
    # PRNG deviation, same policy as SIR/Moran)
    f_in = f_in[np.random.default_rng(seed).permutation(n)]
    return static_fitness_game(spark, f_out, f_in, m, loops=loops,
                               multiple=multiple, seed=seed)
