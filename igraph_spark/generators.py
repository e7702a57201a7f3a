"""Deterministic graph generators (SURVEY.md §2.2).

Spark-native analogs of igraph's constructors
(/root/reference/src/structure_generators.c, src/games.c): built from
``spark.range`` + column arithmetic (scale-out friendly) or literal
fixtures (test scale).  All randomness is hash-based and seeded —
``xxhash64(seed, i)`` — so every generator is exactly reproducible at
any partitioning/parallelism (no RNG state, unlike igraph's MT19937).
"""

from __future__ import annotations

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


def famous(spark: SparkSession, name: str) -> Graph:
    """igraph_famous analog; only "Zachary" is vendored (the parity
    fixture used by the reference's own LPA test)."""
    if name.lower() != "zachary":
        raise ValueError(f"unknown famous graph {name!r}")
    return Graph.from_edge_list(spark, KARATE_EDGES, n=34, directed=False)


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
        return F.when(ref > 0,
                      F.pmod(F.xxhash64(ref, F.lit(seed)), 2 * ref)) \
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
