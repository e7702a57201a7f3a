"""Triad census (Davis & Leinhardt) — igraph_triad_census,
/root/reference/src/motifs.c:1042 (class list :975-1012, golden fixture
examples/simple/triad_census.c/.out, test tests/motifs.at:30-33).

Every unordered vertex triple of a directed graph falls into one of 16
isomorphism classes named by their (mutual, asymmetric, null) dyad
counts plus a Down/Up/Cyclic/Transitive letter:

    003 012 102 021D 021U 021C 111D 111U
    030T 030C 201 120D 120U 120C 210 300

Spark shape (instead of the reference's per-vertex neighbor scan): the
13 classes with >= 2 connected dyads are enumerated by a wedge
self-join over the connected-pair incidence (each triple exactly once:
at its shared vertex when the third pair is null, else at its minimum
vertex), classified by pure column logic; the two single-dyad classes
fall out of dyad totals (012 = A*(n-2) - wedge-asym incidences,
102 = M*(n-2) - wedge-mutual incidences — the same identity
igraph_triad_census_24 uses, motifs.c:914-973); 003 is the remainder
of C(n,3).  Work is O(#wedges) with the same skew profile as the
triangle kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from igraph_spark.graph import Graph, ID, SRC, DST

#: canonical igraph output order (motifs.c:975-1012)
TRIAD_ORDER = ["003", "012", "102", "021D", "021U", "021C", "111D", "111U",
               "030T", "030C", "201", "120D", "120U", "120C", "210", "300"]

#: randesu isoclass j -> triad-census index i, inverted from the
#: reorder block in igraph_triad_census (motifs.c:1062-1078:
#: res[i] = tmp[j]); classes 0, 1, 3 are the disconnected triples
#: RAND-ESU reports as NaN
_RANDESU3_FROM_CENSUS = {0: 0, 1: 1, 3: 2, 6: 3, 2: 4, 4: 5, 5: 6,
                         9: 7, 7: 8, 11: 9, 10: 10, 8: 11, 13: 12,
                         12: 13, 14: 14, 15: 15}
_RANDESU3_DISCONNECTED_DIR = {0, 1, 3}
_RANDESU3_DISCONNECTED_UND = {0, 1}


def _pair_table(graph: Graph) -> DataFrame:
    """Connected unordered pairs (a < b) with direction flags
    (fab = a->b exists, fba = b->a exists).  Undirected graphs make
    every edge mutual (matching igraph_to_undirected->census: the
    reference warns on undirected input and counts each edge as a
    mutual dyad — triad_census.out line 2)."""
    e = (graph.edges.select(SRC, DST)
         .where(F.col(SRC) != F.col(DST)).distinct())
    if not graph.directed:
        e = e.unionByName(e.select(F.col(DST).alias(SRC),
                                   F.col(SRC).alias(DST)))
    return (e.select(F.least(SRC, DST).alias("a"),
                     F.greatest(SRC, DST).alias("b"),
                     (F.col(SRC) < F.col(DST)).alias("isfwd"))
            .groupBy("a", "b")
            .agg(F.max(F.col("isfwd")).alias("fab"),
                 F.max(~F.col("isfwd")).alias("fba")))


def triad_census(graph: Graph) -> DataFrame:
    """-> DataFrame(triad, count): all 16 classes, zeros included."""
    spark = graph.edges.sparkSession
    n = graph.vcount()
    p = _pair_table(graph).persist()

    inc = (p.select(F.col("a").alias("v"), F.col("b").alias("o"),
                    F.col("fab").alias("f_vo"), F.col("fba").alias("f_ov"))
           .unionByName(
               p.select(F.col("b").alias("v"), F.col("a").alias("o"),
                        F.col("fba").alias("f_vo"),
                        F.col("fab").alias("f_ov"))))
    x = inc.select(F.col("v"), F.col("o").alias("o1"),
                   F.col("f_vo").alias("b1"), F.col("f_ov").alias("b2"))
    y = inc.select(F.col("v"), F.col("o").alias("o2"),
                   F.col("f_vo").alias("b3"), F.col("f_ov").alias("b4"))
    third = p.select(F.col("a").alias("o1"), F.col("b").alias("o2"),
                     F.col("fab").alias("t12"), F.col("fba").alias("t21"))
    w = (x.join(y, "v").where(F.col("o1") < F.col("o2"))
         .join(third, ["o1", "o2"], "left")
         # each triple once: at the wedge vertex when the third pair is
         # null, else at its minimum vertex
         .where(F.col("t12").isNull() | (F.col("v") < F.col("o1")))
         .select("b1", "b2", "b3", "b4",
                 F.coalesce("t12", F.lit(False)).alias("b5"),
                 F.coalesce("t21", F.lit(False)).alias("b6")))

    i = lambda c: c.cast("int")  # noqa: E731
    m = (i(F.col("b1") & F.col("b2")) + i(F.col("b3") & F.col("b4"))
         + i(F.col("b5") & F.col("b6")))
    a = (i(F.col("b1") != F.col("b2")) + i(F.col("b3") != F.col("b4"))
         + i(F.col("b5") != F.col("b6")))
    b1, b2, b3, b4, b5, b6 = (F.col(c) for c in
                              ("b1", "b2", "b3", "b4", "b5", "b6"))
    mut_vo1, mut_3 = b1 & b2, b5 & b6
    # classification: the wedge pairs (v,o1), (v,o2) are connected by
    # construction; the letter tests follow motifs.c:975-1012 verbatim
    # (e.g. 111D = asym INTO the mutual dyad, 120D = external vertex
    # sourcing both asym edges)
    triad = (
        F.when((m == 0) & (a == 2),
               F.when(b1 & b3, "021D").when(b2 & b4, "021U")
                .otherwise("021C"))
        .when((m == 0) & (a == 3),
              F.when((b1 & b5 & b4) | (b3 & b6 & b2), "030C")
               .otherwise("030T"))
        .when((m == 1) & (a == 1),
              F.when(mut_vo1, F.when(b4, "111D").otherwise("111U"))
               .otherwise(F.when(b2, "111D").otherwise("111U")))
        .when((m == 1) & (a == 2),
              F.when(mut_3,
                     F.when(b1 & b3, "120D").when(b2 & b4, "120U")
                      .otherwise("120C"))
               .when(mut_vo1,
                     F.when(b4 & b6, "120D").when(b3 & b5, "120U")
                      .otherwise("120C"))
               .otherwise(  # mutual = (v, o2)
                     F.when(b2 & b5, "120D").when(b1 & b6, "120U")
                      .otherwise("120C")))
        .when((m == 2) & (a == 0), "201")
        .when((m == 2) & (a == 1), "210")
        .otherwise("300"))

    agg = (w.select(triad.alias("triad"), m.alias("m"), a.alias("a"))
           .groupBy("triad")
           .agg(F.count("*").alias("count"),
                F.sum("m").alias("inc_m"), F.sum("a").alias("inc_a")))
    rows = {r["triad"]: r for r in agg.collect()}
    counts = {t: int(rows[t]["count"]) if t in rows else 0
              for t in TRIAD_ORDER}
    inc_m = sum(int(r["inc_m"]) for r in rows.values())
    inc_a = sum(int(r["inc_a"]) for r in rows.values())

    dy = p.agg(F.sum(i(F.col("fab") & F.col("fba"))).alias("mu"),
               F.sum(i(F.col("fab") != F.col("fba"))).alias("asym")).first()
    p.unpersist()
    mu = int(dy.mu or 0)
    asym = int(dy.asym or 0)
    counts["012"] = asym * (n - 2) - inc_a
    counts["102"] = mu * (n - 2) - inc_m
    counts["003"] = (n * (n - 1) * (n - 2) // 6
                     - sum(v for t, v in counts.items() if t != "003"))
    return spark.createDataFrame(
        [(t, counts[t]) for t in TRIAD_ORDER], "triad string, count long")


def motifs_randesu(graph: Graph, size: int = 3) -> DataFrame:
    """igraph_motifs_randesu with cut_prob = 0 (exhaustive), size 3
    (/root/reference/src/motifs.c:121) -> DataFrame(isoclass, count),
    count null for the disconnected isoclasses (the reference reports
    NaN for those — fixture igraph_motifs_randesu.out).

    Directed size-3 motif counts are the triad census reordered by the
    isoclass table (the reference computes the census FROM randesu via
    the inverse of this mapping, motifs.c:1062-1078); undirected size-3
    isoclasses are [empty, one-edge, path, triangle] with paths =
    connected triples minus closed ones.
    """
    if size != 3:
        raise NotImplementedError(
            "motif size 4+ sampling is out of scope; size 3 is exact")
    spark = graph.edges.sparkSession
    if graph.directed:
        census = {r["triad"]: int(r["count"])
                  for r in triad_census(graph).collect()}
        rows = []
        for j in range(16):
            if j in _RANDESU3_DISCONNECTED_DIR:
                rows.append((j, None))
            else:
                rows.append((j, census[TRIAD_ORDER[_RANDESU3_FROM_CENSUS[j]]]))
        return spark.createDataFrame(rows, "isoclass long, count long")
    from igraph_spark.algorithms.triangles import _oriented, _wedge_close
    from pyspark.sql import functions as F2
    oriented, deg = _oriented(graph)
    triples = int(deg.agg(F2.sum(F2.col("deg") * (F2.col("deg") - 1) / 2))
                  .first()[0] or 0)
    tri = _wedge_close(oriented).count()
    return spark.createDataFrame(
        [(0, None), (1, None), (2, triples - 3 * tri), (3, tri)],
        "isoclass long, count long")


#: undirected size-4 isoclass indices (topology.c isoclass tables;
#: connected classes confirmed by the reference's bull-graph callback
#: fixture: paw=7, P4=6, and the NaN mask in igraph_motifs_randesu for
#: the disconnected classes)
_UND4_CLASSES = {"claw": 4, "P4": 6, "paw": 7, "C4": 8,
                 "diamond": 9, "K4": 10}
_UND4_DISCONNECTED = {0, 1, 2, 3, 5}


def motifs4_undirected(graph: Graph) -> DataFrame:
    """Exact induced connected 4-vertex subgraph census of an
    undirected graph -> DataFrame(isoclass 0..10, count; null for the
    five disconnected classes) — igraph_motifs_randesu size=4
    (/root/reference/src/motifs.c:121) without enumerating 4-sets.

    Instead of the reference's per-root ESU tree walk, counts come
    from closed-form primitives (the ESCAPE decomposition, Pinar et
    al. 2017 — public): degrees, the triangle list, per-vertex /
    per-edge triangle counts, co-degree pairs and triangle extensions,
    then the inclusion-exclusion transform from non-induced to induced
    counts.  Every primitive is a keyed aggregation over the oriented
    wedge machinery the triangle kernel already uses: O(sum d^2) work,
    no 4-subset blowup, hub skew identical to the triangle kernel's.
    Coefficients verified against brute-force enumeration on bull /
    C4 / K4 / star / Petersen / karate / random fixtures.
    """
    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel
    from igraph_spark.algorithms.triangles import (
        _oriented, _simple_undirected, _wedge_close)

    spark = graph.edges.sparkSession
    simple = _simple_undirected(graph).persist(StorageLevel.MEMORY_AND_DISK)
    oriented, deg = _oriented(graph)
    oriented = oriented.persist(StorageLevel.MEMORY_AND_DISK)
    deg = deg.persist()
    tri = _wedge_close(oriented).persist(StorageLevel.MEMORY_AND_DISK)

    T = tri.count()
    # primitives ------------------------------------------------------
    n_claw = int(deg.agg(F.sum(F.col("deg") * (F.col("deg") - 1)
                               * (F.col("deg") - 2) / 6))
                 .first()[0] or 0)
    du = deg.select(F.col(ID).alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col(ID).alias("v"), F.col("deg").alias("dv"))
    n_p4 = int((simple.join(du, "u").join(dv, "v")
                .agg(F.sum((F.col("du") - 1) * (F.col("dv") - 1)))
                .first()[0] or 0)) - 3 * T

    tv = (tri.select(F.col("a").alias(ID))
          .unionByName(tri.select(F.col("b").alias(ID)))
          .unionByName(tri.select(F.col("c").alias(ID)))
          .groupBy(ID).agg(F.count("*").alias("t")))
    n_paw = int(tv.join(deg, ID)
                .agg(F.sum(F.col("t") * (F.col("deg") - 2)))
                .first()[0] or 0)

    te = (tri.select(F.col("a").alias("u"), F.col("b").alias("v"))
          .unionByName(tri.select(F.col("a").alias("u"),
                                  F.col("c").alias("v")))
          .unionByName(tri.select(F.col("b").alias("u"),
                                  F.col("c").alias("v")))
          .groupBy("u", "v").agg(F.count("*").alias("t")))
    n_diamond = int(te.agg(F.sum(F.col("t") * (F.col("t") - 1) / 2))
                    .first()[0] or 0)

    # co-degree: wedges grouped by endpoints (center-free); generated
    # from the oriented table so each unordered wedge appears once
    inc = (simple.select(F.col("u").alias("ctr"), F.col("v").alias("o"))
           .unionByName(simple.select(F.col("v").alias("ctr"),
                                      F.col("u").alias("o"))))
    w1 = inc.select("ctr", F.col("o").alias("y"))
    w2 = inc.select("ctr", F.col("o").alias("z"))
    codeg = (w1.join(w2, "ctr").where(F.col("y") < F.col("z"))
             .groupBy("y", "z").agg(F.count("*").alias("c")))
    n_c4 = int(codeg.agg(F.sum(F.col("c") * (F.col("c") - 1) / 2))
               .first()[0] or 0) // 2

    # K4: triangle (a<b<c) + d>c adjacent to all three (counted once)
    adj = inc.select(F.col("ctr").alias("x"), F.col("o").alias("d"))
    n_k4 = (tri
            .join(adj.withColumnRenamed("x", "a"), "a")
            .where(F.col("d") > F.col("c"))
            .join(adj.select(F.col("x").alias("b"), F.col("d")),
                  ["b", "d"], "left_semi")
            .join(adj.select(F.col("x").alias("c"), F.col("d")),
                  ["c", "d"], "left_semi")
            .count())

    simple.unpersist()
    oriented.unpersist()
    deg.unpersist()
    tri.unpersist()

    # induced counts (inclusion-exclusion, smallest supergraphs first)
    i_k4 = n_k4
    i_diamond = n_diamond - 6 * i_k4
    i_c4 = n_c4 - i_diamond - 3 * i_k4
    i_paw = n_paw - 4 * i_diamond - 12 * i_k4
    i_p4 = n_p4 - 2 * i_paw - 4 * i_c4 - 6 * i_diamond - 12 * i_k4
    i_claw = n_claw - i_paw - 2 * i_diamond - 4 * i_k4
    vals = {"claw": i_claw, "P4": i_p4, "paw": i_paw, "C4": i_c4,
            "diamond": i_diamond, "K4": i_k4}
    rows = []
    for j in range(11):
        if j in _UND4_DISCONNECTED:
            rows.append((j, None))
        else:
            name = next(k for k, v in _UND4_CLASSES.items() if v == j)
            rows.append((j, int(vals[name])))
    return spark.createDataFrame(rows, "isoclass long, count long")


def motifs_randesu_sampled(graph: Graph, size: int = 3,
                           cut_prob: list[float] | None = None,
                           seed: int = 42) -> DataFrame:
    """RAND-ESU sampling analog (igraph_motifs_randesu with nonzero
    cut_prob, motifs.c:121) -> DataFrame(isoclass, count double):
    unbiased estimates of the connected-subgraph census.

    The reference cuts ESU-tree branches with probability cut_prob[l]
    at level l; the estimator divides by prod(1 - cut_prob).  The
    DataFrame analog samples each connected triple with one
    deterministic coin keyed on the canonical vertex set — hash
    sampling at inclusion probability q = prod(1 - cut_prob[l]) — and
    scales by 1/q.  Same estimator contract (unbiased, q-controlled
    work), deterministic at any parallelism; undirected size 3.
    """
    if size != 3:
        raise NotImplementedError("sampled census: size 3 only "
                                  "(size 4 exact: motifs4_undirected)")
    if graph.directed:
        raise NotImplementedError("sampled census is undirected-only; "
                                  "directed exhaustive: motifs_randesu")
    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel
    from igraph_spark.algorithms.triangles import _simple_undirected

    q = 1.0
    for p in (cut_prob or []):
        if not (0.0 <= p < 1.0):
            raise ValueError("cut probabilities must be in [0, 1)")
        q *= (1.0 - p)
    spark = graph.edges.sparkSession
    if q >= 1.0:
        return motifs_randesu(graph, 3).select(
            "isoclass", F.col("count").cast("double").alias("count"))

    simple = _simple_undirected(graph).persist(StorageLevel.MEMORY_AND_DISK)
    inc = (simple.select(F.col("u").alias("ctr"), F.col("v").alias("o"))
           .unionByName(simple.select(F.col("v").alias("ctr"),
                                      F.col("u").alias("o"))))
    w1 = inc.select("ctr", F.col("o").alias("y"))
    w2 = inc.select("ctr", F.col("o").alias("z"))
    # one coin per unordered triple: a triangle's three wedge
    # occurrences share it, so closed triples stay exactly divisible
    # by 3 and the estimate stays unbiased per-triple
    coin = (F.xxhash64(F.lit(seed),
                       F.least("ctr", "y", "z"),
                       F.greatest(F.least("ctr", "y"),
                                  F.least(F.greatest("ctr", "y"),
                                          F.col("z"))),
                       F.greatest("ctr", "y", "z"))
            .cast("double") / F.lit(2.0 ** 64) + F.lit(0.5))
    wedges = (w1.join(w2, "ctr").where(F.col("y") < F.col("z"))
              .where(coin < F.lit(q)))
    closed = simple.select(F.col("u").alias("y"), F.col("v").alias("z"),
                           F.lit(True).alias("closed"))
    cls = (wedges.join(closed, ["y", "z"], "left")
           .agg(F.sum(F.when(F.col("closed"), 1).otherwise(0))
                .alias("tri3"),
                F.sum(F.when(F.col("closed"), 0).otherwise(1))
                .alias("paths")).first())
    simple.unpersist()
    tri_est = (int(cls["tri3"] or 0) / 3) / q
    path_est = int(cls["paths"] or 0) / q
    return spark.createDataFrame(
        [(0, None), (1, None), (2, path_est), (3, tri_est)],
        "isoclass long, count double")


# ---------------------------------------------------------------------------
# directed size-4 census (218 isoclasses)
# ---------------------------------------------------------------------------

#: ordered vertex pairs in the reference's bit order: the 4x4 adjacency
#: matrix traversed column-major, first cell = least significant bit
#: (igraph_i_isoclass_4_idx, /root/reference/src/topology.c:364 — e.g.
#: edge (1,0) -> 2^0, (0,1) -> 2^3, (2,3) -> 2^11)
_DIR4_PAIRS = [(r, c) for c in range(4) for r in range(4) if r != c]


def _dir4_tables():
    """code -> isoclass for every 12-bit directed 4-vertex adjacency
    code, plus per-class (tau = spanning trees of the skeleton,
    weakly_connected).  Derived, not transcribed: canonical code = MIN
    over the 24 vertex permutations, classes numbered ascending by
    canonical code — the numbering convention of the reference's
    pregenerated tables (igraph_i_isoclass2_4 / igraph_isoclass,
    topology.c:395,696), reproduced and validated against the
    reference's directed-3 ordering (motifs.c:1062-1078) and
    undirected-4 fixtures (igraph_motifs_randesu.out).  218 classes,
    199 weakly connected."""
    global _DIR4_CACHE
    try:
        return _DIR4_CACHE
    except NameError:
        pass
    from itertools import permutations
    pos = {p: i for i, p in enumerate(_DIR4_PAIRS)}
    perms = [[pos[(pm[r], pm[c])] for (r, c) in _DIR4_PAIRS]
             for pm in permutations(range(4))]
    code2canon = []
    for code in range(4096):
        bits = [(code >> k) & 1 for k in range(12)]
        best = 4096
        for pp in perms:
            v = 0
            for k in range(12):
                if bits[k]:
                    v |= 1 << pp[k]
            if v < best:
                best = v
        code2canon.append(best)
    classes = sorted(set(code2canon))
    assert len(classes) == 218
    cls_of = {c: i for i, c in enumerate(classes)}
    code2cls = [cls_of[c] for c in code2canon]
    tau, conn = [], []
    for c in classes:
        und = {(min(p), max(p)) for k, p in enumerate(_DIR4_PAIRS)
               if (c >> k) & 1}
        nb = {i: set() for i in range(4)}
        for i, j in und:
            nb[i].add(j)
            nb[j].add(i)
        seen, stack = {0}, [0]
        while stack:
            v = stack.pop()
            for w in nb[v]:
                if w not in seen:
                    seen.add(w)
                    stack.append(w)
        if len(seen) < 4:
            conn.append(False)
            tau.append(0)
            continue
        conn.append(True)
        lap = [[0] * 4 for _ in range(4)]
        for i, j in und:
            lap[i][i] += 1
            lap[j][j] += 1
            lap[i][j] -= 1
            lap[j][i] -= 1
        m = [row[1:] for row in lap[1:]]
        tau.append(m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1])
                   - m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0])
                   + m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0]))
    _DIR4_CACHE = (code2cls, tau, conn)
    return _DIR4_CACHE


def _attach_pair_flags(df: DataFrame, p: DataFrame, u: str, v: str,
                       fu: str, fv: str) -> DataFrame:
    """Left-join the (a<b, fab, fba) pair table onto columns u, v and
    emit direction-resolved booleans fu = u->v, fv = v->u."""
    pj = p.select(F.col("a").alias("__pa"), F.col("b").alias("__pb"),
                  F.col("fab").alias("__fab"), F.col("fba").alias("__fba"))
    lo, hi = F.least(u, v), F.greatest(u, v)
    out = (df.join(pj, (lo == F.col("__pa")) & (hi == F.col("__pb")), "left")
           .withColumn(fu, F.coalesce(
               F.when(F.col(u) < F.col(v), F.col("__fab"))
                .otherwise(F.col("__fba")), F.lit(False)))
           .withColumn(fv, F.coalesce(
               F.when(F.col(u) < F.col(v), F.col("__fba"))
                .otherwise(F.col("__fab")), F.lit(False)))
           .drop("__pa", "__pb", "__fab", "__fba"))
    return out


def motifs4_directed(graph: Graph) -> DataFrame:
    """Exact induced connected 4-vertex subgraph census of a DIRECTED
    graph -> DataFrame(isoclass 0..217, count; null for the 19
    weakly-disconnected classes) — igraph_motifs_randesu size=4
    directed (/root/reference/src/motifs.c:121; 218 classes per
    igraph_subisomorphic_lad.c:95).

    Spark shape: instead of the reference's per-root ESU tree walk
    (inherently recursive), every weakly-connected 4-set is reached
    once per labeled spanning tree of its induced skeleton.  All
    4-vertex trees are paths or stars, so two join pipelines enumerate
    every (set, tree) pair with no recursion; each pair's induced
    directed subgraph is encoded as the reference's 12-bit adjacency
    code over the sorted vertices and classified through the derived
    4096-entry lookup, and per-class totals divide by tau(class) —
    the skeleton spanning-tree count, constant within a class because
    isomorphic subgraphs share a skeleton.  Work is
    O(sum_e (d_u-1)(d_v-1) + sum_v d^3/6): the same census work as
    ESU, the triangle kernel's hub-skew profile, zero driver loops
    (one final <=4096-row collect)."""
    if not graph.directed:
        raise ValueError("directed graphs only — undirected census: "
                         "motifs4_undirected")
    from pyspark.storagelevel import StorageLevel
    spark = graph.edges.sparkSession
    p = _pair_table(graph).persist(StorageLevel.MEMORY_AND_DISK)
    inc = (p.select(F.col("a").alias("v"), F.col("b").alias("o"),
                    F.col("fab").alias("f_vo"), F.col("fba").alias("f_ov"))
           .unionByName(
               p.select(F.col("b").alias("v"), F.col("a").alias("o"),
                        F.col("fba").alias("f_vo"),
                        F.col("fab").alias("f_ov")))
           ).persist(StorageLevel.MEMORY_AND_DISK)

    # stars: center v, leaves x < y < z; the 6 center-leaf flags ride
    # the enumeration, the 3 leaf-leaf pairs left-join the pair table
    stars = (inc.select("v", F.col("o").alias("x"),
                        F.col("f_vo").alias("f_vx"),
                        F.col("f_ov").alias("f_xv"))
             .join(inc.select("v", F.col("o").alias("y"),
                              F.col("f_vo").alias("f_vy"),
                              F.col("f_ov").alias("f_yv")), "v")
             .where(F.col("x") < F.col("y"))
             .join(inc.select("v", F.col("o").alias("z"),
                              F.col("f_vo").alias("f_vz"),
                              F.col("f_ov").alias("f_zv")), "v")
             .where(F.col("y") < F.col("z")))
    stars = _attach_pair_flags(stars, p, "x", "y", "f_xy", "f_yx")
    stars = _attach_pair_flags(stars, p, "x", "z", "f_xz", "f_zx")
    stars = _attach_pair_flags(stars, p, "y", "z", "f_yz", "f_zy")
    star_roles = [("v", "x", "f_vx", "f_xv"), ("v", "y", "f_vy", "f_yv"),
                  ("v", "z", "f_vz", "f_zv"), ("x", "y", "f_xy", "f_yx"),
                  ("x", "z", "f_xz", "f_zx"), ("y", "z", "f_yz", "f_zy")]
    star_vs = ("v", "x", "y", "z")

    # paths: a - b - c - d over skeleton edges, deduped by a < d; the
    # 6 tree flags ride along, the 3 chord pairs left-join
    paths = (inc.select(F.col("v").alias("a"), F.col("o").alias("b"),
                        F.col("f_vo").alias("f_ab"),
                        F.col("f_ov").alias("f_ba"))
             .join(inc.select(F.col("v").alias("b"), F.col("o").alias("c"),
                              F.col("f_vo").alias("f_bc"),
                              F.col("f_ov").alias("f_cb")), "b")
             .where(F.col("c") != F.col("a"))
             .join(inc.select(F.col("v").alias("c"), F.col("o").alias("d"),
                              F.col("f_vo").alias("f_cd"),
                              F.col("f_ov").alias("f_dc")), "c")
             .where((F.col("d") != F.col("b")) & (F.col("a") < F.col("d"))))
    paths = _attach_pair_flags(paths, p, "a", "c", "f_ac", "f_ca")
    paths = _attach_pair_flags(paths, p, "a", "d", "f_ad", "f_da")
    paths = _attach_pair_flags(paths, p, "b", "d", "f_bd", "f_db")
    path_roles = [("a", "b", "f_ab", "f_ba"), ("b", "c", "f_bc", "f_cb"),
                  ("c", "d", "f_cd", "f_dc"), ("a", "c", "f_ac", "f_ca"),
                  ("a", "d", "f_ad", "f_da"), ("b", "d", "f_bd", "f_db")]
    path_vs = ("a", "b", "c", "d")

    def coded(df: DataFrame, vs, roles) -> DataFrame:
        srt = F.array_sort(F.array(*[F.col(c) for c in vs]))
        keys, vals = [], []
        for u, v, fu, fv in roles:
            keys += [F.concat_ws("_", u, v), F.concat_ws("_", v, u)]
            vals += [F.col(fu), F.col(fv)]
        m = F.map_from_arrays(F.array(*keys), F.array(*vals))
        df = df.select(srt.alias("vs"), m.alias("fm"))
        code = F.lit(0)
        for k, (r, c) in enumerate(_DIR4_PAIRS):
            key = F.concat_ws("_", F.element_at("vs", r + 1),
                              F.element_at("vs", c + 1))
            code = code + F.when(
                F.coalesce(F.element_at("fm", key), F.lit(False)),
                F.lit(1 << k)).otherwise(F.lit(0))
        return df.select(code.alias("code")).groupBy("code").count()

    agg = (coded(stars, star_vs, star_roles)
           .unionByName(coded(paths, path_vs, path_roles))
           .groupBy("code").agg(F.sum("count").alias("count")).collect())
    p.unpersist()
    inc.unpersist()

    code2cls, tau, conn = _dir4_tables()
    totals = [0] * 218
    for r in agg:
        totals[code2cls[int(r["code"])]] += int(r["count"])
    rows = []
    for cls in range(218):
        if not conn[cls]:
            assert totals[cls] == 0
            rows.append((cls, None))
        else:
            assert totals[cls] % tau[cls] == 0, \
                f"class {cls}: {totals[cls]} not divisible by tau {tau[cls]}"
            rows.append((cls, totals[cls] // tau[cls]))
    return spark.createDataFrame(rows, "isoclass long, count long")
