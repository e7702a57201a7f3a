"""LAD subgraph isomorphism — igraph_subisomorphic_lad
(/root/reference/src/lad.c; C. Solnon's LAD, AIJ 174(12-13) 2010).

What LAD adds over the VF2-analog join enumeration (isomorphism.py):
user-supplied per-pattern-vertex DOMAINS (lad.c ``igraph_i_lad_
initDomains``), support for isolated pattern vertices, and pre-search
domain FILTERING before any branching (lad.c ``filter``/
``ensureGACallDiff``).  The reference is a sequential backtracking
solver; the Spark-native shape keeps the domain as a DataFrame
``(pu, tv)`` and filters it with set-at-a-time joins:

* degree consistency — ``deg_G(tv) >= deg_P(pu)`` per direction
  (lad.c ``igraph_i_lad_initDomains`` compatibility check);
* loop consistency — a pattern vertex carrying a self-loop binds only
  to looped target vertices (the reference maps looped pattern
  vertices onto looped images; loop MULTIPLICITY is ignored, the
  module-wide simple-graph contract), and ``induced`` additionally
  forbids a loop at the image of a loop-FREE pattern vertex;
* arc consistency to fixpoint — for every pattern edge ``(u, v)``, a
  candidate ``(u, a)`` survives only if some ``b ∈ D(v)`` with
  ``(a, b)`` an edge of G exists.  All arc-sides are revised in
  PARALLEL each round (union of per-arc-side support semi-joins →
  one countDistinct aggregate → one join), integer changed-row
  convergence, lineage truncated per round — fully distributed,
  O(k·V) domain rows against the O(m) edge table, no driver state,
  and the logical plan stays linear in the number of pattern arcs;
* LAD's matching-based filter (GAC(allDiff) over each candidate's
  neighbourhood, lad.c ``igraph_i_lad_checkLAD``) — a driver-gated
  refinement applied when the AC-filtered domain is small enough to
  collect (it is the reference's own sequential kernel; at scale the
  distributed AC pass is the workhorse and the matching refinement
  adds nothing on the huge side because enumeration binds against the
  filtered domain anyway).

Enumeration then reuses the connected-join bind order of
isomorphism.py, every bind semi-joined against its filtered domain,
injectivity and induced non-edges as filters / anti-joins — i.e. the
search tree the reference walks sequentially becomes a relational
plan Catalyst can reorder and AQE can skew-split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from igraph_spark.graph import Graph, SRC, DST, ID
from igraph_spark.algorithms.isomorphism import _ordered_edges

__all__ = ["lad_domains", "subisomorphic_lad", "count_subisomorphisms_lad"]

_PU, _TV = "pu", "tv"


def _pattern_shape(pattern: list[tuple[int, int]], n: int | None):
    """-> (k, directed-degree dicts) for the pattern (driver-side: the
    pattern is a handful of literals, never data)."""
    touched = {v for e in pattern for v in e}
    k = (max(touched) + 1 if touched else 0) if n is None else n
    if touched and max(touched) >= k:
        raise ValueError(f"pattern vertex {max(touched)} out of range "
                         f"for n={k}")
    outd = {u: 0 for u in range(k)}
    ind = {u: 0 for u in range(k)}
    for a, b in {(a, b) for a, b in pattern if a != b}:
        # dedup: the reference LAD works on simple graphs
        outd[a] += 1
        ind[b] += 1
    return k, outd, ind


def lad_domains(graph: Graph, pattern: list[tuple[int, int]],
                n: int | None = None,
                domains: "dict[int, list[int]] | DataFrame | None" = None,
                max_rounds: int = 64) -> DataFrame:
    """Build and arc-consistency-filter the candidate domain ->
    DataFrame(pu, tv): target vertex ``tv`` is a surviving candidate
    image for pattern vertex ``pu``.

    ``domains`` (lad.c ``domainsvec``): optional explicit candidate
    lists per pattern vertex; missing keys mean "all vertices".  At
    scale pass a DataFrame(pu int, tv long) instead of driver lists —
    every pattern vertex is then constrained to its rows (the
    reference API's vector-of-vectors is inherently driver-sized; the
    relational form keeps a billion-vertex domain distributed).
    """
    spark = graph.edges.sparkSession
    k, outd, ind = _pattern_shape(pattern, n)
    if k == 0:
        return spark.createDataFrame([], f"{_PU} int, {_TV} long")

    if graph.directed:
        deg = (graph.degree(mode="out", loops=False)
               .withColumnRenamed("degree", "outdeg")
               .join(graph.degree(mode="in", loops=False)
                     .withColumnRenamed("degree", "indeg"), ID))
    else:
        deg = graph.degree(loops=False).withColumnRenamed("degree", "outdeg")

    shape = spark.createDataFrame(
        [(u, outd[u] + (0 if graph.directed else ind[u]),
          ind[u]) for u in range(k)],
        f"{_PU} int, need_out long, need_in long")
    cond = [deg["outdeg"] >= shape["need_out"]]
    if graph.directed:
        cond.append(deg["indeg"] >= shape["need_in"])
    # degree-compatibility cross: k pattern rows broadcast against the
    # vertex-degree table -> O(k·V) candidate rows, never collected
    dom = (deg.join(F.broadcast(shape),
                    cond[0] if len(cond) == 1 else cond[0] & cond[1])
           .select(_PU, F.col(ID).alias(_TV)))
    loop_pus = sorted({a for a, b in pattern if a == b})
    if loop_pus:
        # a looped pattern vertex only maps onto a looped target
        # vertex (lad.c initDomains checks the loop bit); constrain
        # those domains, leave the rest untouched
        looped_tv = (graph.edges.where(F.col(SRC) == F.col(DST))
                     .select(F.col(SRC).cast("long").alias(_TV))
                     .distinct())
        lp = spark.createDataFrame([(u,) for u in loop_pus],
                                   f"{_PU} int")
        dom = (dom.join(F.broadcast(lp), _PU, "left_anti")
               .unionByName(dom.join(F.broadcast(lp), _PU, "left_semi")
                            .join(looped_tv, _TV, "left_semi")))
    if isinstance(domains, DataFrame):
        dom = dom.join(domains.select(F.col(_PU).cast("int"),
                                      F.col(_TV).cast("long")),
                       [_PU, _TV], "left_semi")
    elif domains:
        user = spark.createDataFrame(
            [(int(u), int(t)) for u, ts in domains.items() for t in ts],
            f"{_PU} int, {_TV} long")
        constrained = sorted(int(u) for u in domains)
        dom = (dom.join(F.broadcast(
                   spark.createDataFrame([(u,) for u in constrained],
                                         f"{_PU} int")),
                   _PU, "left_anti")
               .unionByName(dom.join(user, [_PU, _TV], "left_semi")))

    e = graph.edges.select(SRC, DST).where(F.col(SRC) != F.col(DST))
    if not graph.directed:
        e = e.unionByName(e.select(F.col(DST).alias(SRC),
                                   F.col(SRC).alias(DST)))
    e = e.distinct().persist(StorageLevel.MEMORY_AND_DISK)

    arcs = sorted({(a, b) for a, b in pattern if a != b})

    # Parallel AC: ALL arc-sides are revised in one pass per round (the
    # reference's worklist is sequential; both contract to the same
    # greatest fixpoint).  Each arc (u, v) imposes two unary supports —
    # D(u) needs a successor image in D(v), D(v) a predecessor image in
    # D(u) (e is symmetrized when undirected, so this is N(u)/N(v)).
    # One union of per-arc-side support sets + one countDistinct agg +
    # one join per round keeps the logical plan LINEAR in |arcs|; a
    # sequential per-arc rebuild of dom (filter + union) references the
    # previous plan 3x per revision and blows the plan up 3^(2|arcs|)
    # per round — Catalyst analysis OOMs on a 6-arc pattern.
    need = {u: 0 for u in range(k)}
    for (u, v) in arcs:
        need[u] += 1
        need[v] += 1
    need_df = spark.createDataFrame(
        [(u, need[u]) for u in range(k)], f"{_PU} int, need int")

    dom = dom.localCheckpoint(eager=True)
    size = dom.count()
    for _ in range(max_rounds):
        if not arcs:
            break
        sides = []
        for i, (u, v) in enumerate(arcs):
            dv = dom.where(F.col(_PU) == v).select(F.col(_TV).alias(DST))
            sides.append(
                e.join(dv, DST, "left_semi")
                .select(F.lit(u).alias(_PU), F.col(SRC).alias(_TV),
                        F.lit(2 * i).alias("aid")))
            du = dom.where(F.col(_PU) == u).select(F.col(_TV).alias(SRC))
            sides.append(
                e.join(du, SRC, "left_semi")
                .select(F.lit(v).alias(_PU), F.col(DST).alias(_TV),
                        F.lit(2 * i + 1).alias("aid")))
        sat = sides[0]
        for s in sides[1:]:
            sat = sat.unionByName(s)
        nsat = (sat.groupBy(_PU, _TV)
                .agg(F.count_distinct("aid").alias("nsat")))
        nxt = (dom.join(F.broadcast(need_df), _PU)
               .join(nsat, [_PU, _TV], "left")
               .where((F.col("need") == 0)
                      | (F.coalesce(F.col("nsat"), F.lit(0))
                         == F.col("need")))
               .select(_PU, _TV))
        nxt = nxt.localCheckpoint(eager=True)  # truncate per round
        new_size = nxt.count()  # integer convergence, never float
        dom.unpersist()
        dom = nxt
        if new_size == size:
            break
        size = new_size
    e.unpersist()
    return dom


def _matching_filter(dom_rows: list[tuple[int, int]],
                     adj: dict[int, set[int]],
                     pattern: list[tuple[int, int]], k: int,
                     directed: bool) -> set[tuple[int, int]]:
    """LAD's checkLAD (lad.c:742): candidate (u,a) survives only if the
    bipartite graph {pattern neighbours of u} x {target neighbours of a
    that are in the matching neighbour's domain} has a matching
    covering all pattern neighbours.  Driver-side Kuhn's algorithm over
    the (gated, small) collected domain."""
    nbr: dict[int, set[int]] = {u: set() for u in range(k)}
    for a, b in pattern:
        if a == b:
            continue
        # underlying adjacency both ways: a sound relaxation for the
        # directed case (any valid image of a pattern neighbour is
        # adjacent to `a` in the underlying graph), exact when undirected
        nbr[a].add(b)
        nbr[b].add(a)
    dom_by_pu: dict[int, set[int]] = {}
    for u, a in dom_rows:
        dom_by_pu.setdefault(u, set()).add(a)

    def covers(u: int, a: int) -> bool:
        pn = sorted(nbr[u])
        if not pn:
            return True
        tn = adj.get(a, set())
        cand = {v: [b for b in tn if b in dom_by_pu.get(v, ())]
                for v in pn}
        match: dict[int, int] = {}

        def try_kuhn(v: int, seen: set[int]) -> bool:
            for b in cand[v]:
                if b in seen:
                    continue
                seen.add(b)
                if b not in match or try_kuhn(match[b], seen):
                    match[b] = v
                    return True
            return False

        return all(try_kuhn(v, set()) for v in pn)

    alive = set(dom_rows)
    changed = True
    while changed:  # propagate deletions to fixpoint, like the reference
        changed = False
        for (u, a) in sorted(alive):
            if not covers(u, a):
                alive.discard((u, a))
                dom_by_pu[u].discard(a)
                changed = True
    return alive


def subisomorphic_lad(graph: Graph, pattern: list[tuple[int, int]],
                      n: int | None = None,
                      domains: "dict[int, list[int]] | DataFrame | None"
                      = None,
                      induced: bool = False,
                      filter_threshold: int = 20_000) -> DataFrame:
    """All injective domain-respecting mappings of ``pattern`` into the
    graph -> DataFrame(v0, ..., v{k-1}) (igraph_subisomorphic_lad with
    ``maps``; ``iso``/``map`` are ``.count() > 0`` / ``.first()``).

    ``n`` names the pattern vertex count when it exceeds the edge
    list's max id + 1 (isolated pattern vertices — supported here like
    the reference, unlike the VF2-analog).  ``filter_threshold`` gates
    the driver-side matching refinement: an AC-filtered domain with at
    most this many rows additionally runs lad.c's checkLAD analog.
    """
    k, _, _ = _pattern_shape(pattern, n)
    spark = graph.edges.sparkSession
    if k == 0:
        return spark.createDataFrame([], "v0 long")

    dom = lad_domains(graph, pattern, n=k, domains=domains)
    dom = dom.persist(StorageLevel.MEMORY_AND_DISK)
    dom_n = dom.count()
    if dom_n == 0:
        dom.unpersist()
        return spark.createDataFrame(
            [], ", ".join(f"v{i} long" for i in range(k)))

    simple = [(a, b) for a, b in pattern if a != b]
    if dom_n <= filter_threshold and simple:
        rows = [(int(r[_PU]), int(r[_TV])) for r in dom.collect()]
        tvs = {a for _, a in rows}
        tv_df = spark.createDataFrame([(t,) for t in sorted(tvs)],
                                      f"{ID} long")
        e_small_df = (graph.edges.select(SRC, DST)
                      .where(F.col(SRC) != F.col(DST))
                      .join(F.broadcast(tv_df.withColumnRenamed(ID, SRC)),
                            SRC, "left_semi")
                      .join(F.broadcast(tv_df.withColumnRenamed(ID, DST)),
                            DST, "left_semi").distinct()
                      .persist(StorageLevel.MEMORY_AND_DISK))
        # candidate vertices can still span a dense region: gate the
        # edge collect too (the refinement is optional — AC already ran)
        if e_small_df.count() <= 25 * filter_threshold:
            adj: dict[int, set[int]] = {}
            for r in e_small_df.collect():
                a, b = int(r[SRC]), int(r[DST])
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)  # underlying adjacency
            alive = _matching_filter(rows, adj, simple, k,
                                     graph.directed)
            if len(alive) < len(rows):
                dom.unpersist()
                dom = spark.createDataFrame(
                    sorted(alive), f"{_PU} int, {_TV} long").persist(
                    StorageLevel.MEMORY_AND_DISK)
        e_small_df.unpersist()

    e = graph.edges.select(SRC, DST).where(F.col(SRC) != F.col(DST))
    if not graph.directed:
        e = e.unionByName(e.select(F.col(DST).alias(SRC),
                                   F.col(SRC).alias(DST)))
    e = e.distinct().persist(StorageLevel.MEMORY_AND_DISK)

    def dcol(u: int) -> DataFrame:
        return dom.where(F.col(_PU) == u).select(
            F.col(_TV).alias(f"v{u}"))

    maps: DataFrame | None = None
    bound: set[int] = set()
    for (a, b) in _ordered_edges(simple) if simple else []:
        ca, cb = f"v{a}", f"v{b}"
        eab = (e.select(F.col(SRC).alias(ca), F.col(DST).alias(cb))
               .join(dcol(a), ca, "left_semi")
               .join(dcol(b), cb, "left_semi"))
        if maps is None or (a not in bound and b not in bound):
            maps = eab if maps is None else maps.crossJoin(eab)
        elif a in bound and b in bound:
            maps = maps.join(eab, [ca, cb], "left_semi")
        elif a in bound:
            maps = maps.join(eab, ca)
        else:
            maps = maps.join(eab, cb)
        newly = {a, b} - bound
        for nv in newly:
            for ov in bound | (newly - {nv}):
                if ov < nv or ov in bound:
                    maps = maps.where(F.col(f"v{nv}") != F.col(f"v{ov}"))
        bound |= newly

    for u in range(k):  # isolated pattern vertices: domain-only binds
        if u in bound:
            continue
        du = dcol(u)
        maps = du if maps is None else maps.crossJoin(du)
        for ov in bound:
            maps = maps.where(F.col(f"v{u}") != F.col(f"v{ov}"))
        bound.add(u)

    if induced:
        # applies even to edge-free patterns: induced embeddings of an
        # independent set must avoid ALL target edges among the images
        pset = {(a, b) for a, b in simple}
        if not graph.directed:
            pset |= {(b, a) for a, b in simple}
        for i in range(k):
            for j in range(k):
                if i != j and (i, j) not in pset:
                    if not graph.directed and i > j:
                        continue
                    maps = maps.join(
                        e.select(F.col(SRC).alias(f"v{i}"),
                                 F.col(DST).alias(f"v{j}")),
                        [f"v{i}", f"v{j}"], "left_anti")
        # induced also covers loops: a loop-free pattern vertex's
        # image must itself be loop-free (its looped counterpart is
        # already domain-constrained in lad_domains)
        loop_pus = {a for a, b in pattern if a == b}
        loopless = [u for u in range(k) if u not in loop_pus]
        if loopless:
            looped_tv = (graph.edges
                         .where(F.col(SRC) == F.col(DST))
                         .select(F.col(SRC).cast("long").alias("ltv"))
                         .distinct()
                         .persist(StorageLevel.MEMORY_AND_DISK))
            for u in loopless:
                maps = maps.join(
                    looped_tv.withColumnRenamed("ltv", f"v{u}"),
                    f"v{u}", "left_anti")
    return maps.select(*[f"v{i}" for i in range(k)])


def count_subisomorphisms_lad(graph: Graph,
                              pattern: list[tuple[int, int]],
                              n: int | None = None,
                              domains: dict[int, list[int]] | None = None,
                              induced: bool = False) -> int:
    """len(maps) of igraph_subisomorphic_lad."""
    return subisomorphic_lad(graph, pattern, n=n, domains=domains,
                             induced=induced).count()
