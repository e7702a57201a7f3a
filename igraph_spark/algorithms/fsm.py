"""Frequent subgraph mining over a distributed graph database —
igraph_fsm.h / src/fsm.c (the reference fork's EvoMine module):
``igraph_shallow_support`` (fsm.c:959), ``igraph_mib_support``
(fsm.c:745), ``igraph_egobased_support`` (fsm.c:890),
``igraph_aggregated_db_support`` (fsm.c:988), ``igraph_gspan``
(fsm.c:2246), ``igraph_subisomorphic_evomine`` (fsm.c:667).

The reference mines a driver-resident ``igraph_vector_ptr_t`` of
graphs with an OpenMP-parallel VF2 per (pattern node, target node)
pair.  The Spark-native shape inverts this: the graph DATABASE is a
single edge DataFrame keyed by a ``gid`` column (millions of small
graphs — exactly the "per-repo import graph" layout the extraction
pipeline produces), the PATTERN lattice lives in the driver (tiny:
patterns have <= ~7 vertices), and each support evaluation is ONE
distributed multiway join that binds pattern vertices edge-by-edge
across every graph of the database simultaneously.  Pattern-growth
bookkeeping (candidate generation, canonical-form dedup) is pure
driver Python over objects of a few bytes; all data-proportional work
is Catalyst joins that shuffle on (gid, bound-vertex) keys, so skew is
bounded by the largest single member graph, not the database size.

Candidate generation is levelwise (extend every frequent k-edge
pattern by one edge, dedup by canonical permutation) rather than the
reference's rightmost-path DFS-code growth — with support counting
pushed into Spark, the driver lattice is no longer the bottleneck and
the levelwise rule keeps the completeness argument elementary: every
connected (k+1)-edge pattern contains a connected k-edge subpattern
(drop a spanning-tree leaf edge or a cycle edge), which by
anti-monotonicity is also frequent, and every one-edge extension of
every frequent pattern is generated.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

GID = "gid"
SRC, DST = "src", "dst"
VCOLOR, ECOLOR = "vcolor", "ecolor"


# --------------------------------------------------------------- pattern

@dataclass(frozen=True)
class Pattern:
    """A small connected pattern graph: vertices 0..k-1, an edge list,
    and optional vertex / edge colors (igraph's ``vertex_color2`` /
    ``edge_color2`` arguments; ``None`` means uncolored = match any)."""
    edges: tuple[tuple[int, int], ...]
    vcolors: tuple[int, ...] | None = None     # len k
    ecolors: tuple[int, ...] | None = None     # len |edges|
    directed: bool = False

    @property
    def k(self) -> int:
        return max(max(a, b) for a, b in self.edges) + 1

    def canonical_key(self):
        """Isomorphism-invariant key: the minimum over all vertex
        permutations of the sorted colored edge encoding.  Patterns
        are tiny (k <= ~7) so brute-force canonicalization is cheap
        and has none of the DFS-code-minimality subtleties."""
        k = self.k
        vc = self.vcolors or tuple([0] * k)
        ec = self.ecolors or tuple([0] * len(self.edges))
        best = None
        for perm in itertools.permutations(range(k)):
            enc = []
            for (a, b), c in zip(self.edges, ec):
                pa, pb = perm[a], perm[b]
                if self.directed:
                    enc.append((pa, pb, c))
                else:
                    enc.append((min(pa, pb), max(pa, pb), c))
            enc.sort()
            cand = (tuple(enc), tuple(vc[a] for a in _inv(perm)))
            if best is None or cand < best:
                best = cand
        return best


def _inv(perm):
    out = [0] * len(perm)
    for i, p in enumerate(perm):
        out[p] = i
    return out


def _connected(edges: tuple[tuple[int, int], ...]) -> bool:
    verts = {v for e in edges for v in e}
    if not verts:
        return False
    seen = {next(iter(verts))}
    frontier = set(seen)
    while frontier:
        nxt = {b for a, b in edges if a in frontier} | \
              {a for a, b in edges if b in frontier}
        frontier = nxt - seen
        seen |= frontier
    return seen == verts


def _ordered_edges(pattern):
    """Connectivity-greedy edge order so every join (after the first)
    touches an already-bound vertex — same rule as
    isomorphism.subgraph_isomorphisms."""
    remaining = list(pattern)
    ordered, bound = [], set()
    while remaining:
        pick = next((pe for pe in remaining
                     if not bound or pe[0] in bound or pe[1] in bound),
                    remaining[0])
        remaining.remove(pick)
        ordered.append(pick)
        bound.update(pick)
    return ordered


# ----------------------------------------------------------- embeddings

def db_embeddings(edges: DataFrame, pattern: Pattern,
                  vertices: DataFrame | None = None,
                  induced: bool = False) -> DataFrame:
    """All injective embeddings of ``pattern`` into every graph of the
    database at once -> DataFrame(gid, v0..v{k-1}).

    ``edges``: (gid, src, dst[, ecolor]); ``vertices``: (gid, id
    [, vcolor]) — required when the pattern has vertex colors.
    Undirected patterns match each edge in either orientation.  Every
    join keys on (gid, bound-vertex), so the shuffle width scales with
    the whole database while per-key work is bounded by one member
    graph — the 100 TB layout.  Mirrors igraph_i_subisomorphic
    (fsm.c:176) semantics: injective, optionally induced.
    """
    k = pattern.k
    peset = list(pattern.edges)
    pec = list(pattern.ecolors) if pattern.ecolors else [None] * len(peset)
    ecmap = dict(zip(peset, pec))

    has_ecol = ECOLOR in edges.columns
    if getattr(edges, "_fsm_prepared", False):
        e = edges          # already oriented/distinct/cached by gspan()
    else:
        # Direct (non-gspan) calls get a LAZY oriented table — no
        # persist, so repeated mib_support/shallow_support calls leak
        # no cached blocks.  Within one action Catalyst reuses the
        # distinct's Exchange across the self-joins (ReusedExchange);
        # callers running MANY patterns should pre-prepare + persist
        # the table themselves the way gspan() does (see gspan:~310),
        # then unpersist when done.
        e = edges.select(GID, SRC, DST, *([ECOLOR] if has_ecol else []))
        e = e.where(F.col(SRC) != F.col(DST))
        if not pattern.directed:
            flip = e.select(GID, F.col(DST).alias(SRC),
                            F.col(SRC).alias(DST),
                            *([ECOLOR] if has_ecol else []))
            e = e.unionByName(flip)
        e = e.distinct()

    def edge_view(a, b):
        ev = e
        c = ecmap.get((a, b))
        if c is not None:
            if not has_ecol:
                raise ValueError("pattern has edge colors but the "
                                 "database has no 'ecolor' column")
            ev = ev.where(F.col(ECOLOR) == int(c))
        return ev.select(GID, F.col(SRC).alias(f"v{a}"),
                         F.col(DST).alias(f"v{b}"))

    maps: DataFrame | None = None
    bound: set[int] = set()
    for (a, b) in _ordered_edges(peset):
        ca, cb = f"v{a}", f"v{b}"
        ev = edge_view(a, b)
        if maps is None:
            maps = ev
        elif a not in bound and b not in bound:
            maps = maps.join(ev, GID)          # fresh component: gid join
        elif a in bound and b in bound:
            maps = maps.join(ev, [GID, ca, cb], "left_semi")
        elif a in bound:
            maps = maps.join(ev, [GID, ca])
        else:
            maps = maps.join(ev, [GID, cb])
        newly = {a, b} - bound
        for nv in newly:
            for ov in bound | (newly - {nv}):
                if ov < nv or ov in bound:
                    maps = maps.where(F.col(f"v{nv}") != F.col(f"v{ov}"))
        bound |= newly
    if len(bound) != k:
        raise ValueError("pattern must be connected over 0..k-1")

    if pattern.vcolors is not None:
        if vertices is None or VCOLOR not in vertices.columns:
            raise ValueError("pattern has vertex colors but no "
                             "(gid, id, vcolor) vertices table given")
        vt = vertices.select(GID, "id", VCOLOR)
        for i, c in enumerate(pattern.vcolors):
            maps = maps.join(
                vt.where(F.col(VCOLOR) == int(c))
                  .select(GID, F.col("id").alias(f"v{i}")),
                [GID, f"v{i}"], "left_semi")

    if induced:
        pset = set(peset) | (set() if pattern.directed
                             else {(b, a) for a, b in peset})
        plain = e.select(GID, SRC, DST)
        for i in range(k):
            for j in range(k):
                if i == j or (i, j) in pset:
                    continue
                if not pattern.directed and i > j:
                    continue
                maps = maps.join(
                    plain.select(GID, F.col(SRC).alias(f"v{i}"),
                                 F.col(DST).alias(f"v{j}")),
                    [GID, f"v{i}", f"v{j}"], "left_anti")
    return maps.select(GID, *[f"v{i}" for i in range(k)])


# ------------------------------------------------------ support measures

def shallow_support(edges: DataFrame, pattern: Pattern,
                    vertices: DataFrame | None = None,
                    induced: bool = False) -> DataFrame:
    """igraph_shallow_support (fsm.c:959) per database graph: 1 iff the
    pattern embeds -> DataFrame(gid, support)."""
    emb = db_embeddings(edges, pattern, vertices, induced)
    return (emb.select(GID).distinct()
            .select(GID, F.lit(1).alias("support")))


def mib_support(edges: DataFrame, pattern: Pattern,
                vertices: DataFrame | None = None,
                induced: bool = False) -> DataFrame:
    """Minimum-image-based support (fsm.c:745, Bringmann & Nijssen):
    per graph, min over pattern vertices of the number of distinct
    target vertices that vertex maps to.  Overlap-aware and
    anti-monotone -> DataFrame(gid, support)."""
    emb = db_embeddings(edges, pattern, vertices, induced)
    aggs = [F.countDistinct(f"v{i}").alias(f"c{i}")
            for i in range(pattern.k)]
    per = emb.groupBy(GID).agg(*aggs)
    mincol = F.col("c0") if pattern.k == 1 else F.least(
        *[F.col(f"c{i}") for i in range(pattern.k)])
    return per.select(GID, mincol.cast("long").alias("support"))


def egobased_support(edges: DataFrame, pattern: Pattern,
                     ego: int = 0,
                     vertices: DataFrame | None = None,
                     induced: bool = False) -> DataFrame:
    """igraph_egobased_support (fsm.c:890): number of distinct target
    vertices that can host the designated pattern vertex ``ego`` (the
    reference marks it by vertex color 0) -> DataFrame(gid, support)."""
    emb = db_embeddings(edges, pattern, vertices, induced)
    return (emb.groupBy(GID)
            .agg(F.countDistinct(f"v{ego}").cast("long").alias("support")))


_MEASURES = {"shallow": shallow_support, "mib": mib_support,
             "ego": egobased_support}


def db_support(edges: DataFrame, pattern: Pattern,
               measure: str = "shallow",
               vertices: DataFrame | None = None,
               induced: bool = False) -> int:
    """igraph_aggregated_db_support (fsm.c:988): sum of the single-graph
    support over every graph in the database."""
    per = _MEASURES[measure](edges, pattern, vertices, induced)
    row = per.agg(F.coalesce(F.sum("support"), F.lit(0))).first()
    return int(row[0])


# ------------------------------------------------------------------ gSpan

@dataclass
class FrequentPattern:
    pattern: Pattern
    support: int


def gspan(edges: DataFrame, min_supp: int, max_edges: int = 3,
          measure: str = "shallow",
          vertices: DataFrame | None = None,
          directed: bool = False,
          induced: bool = False) -> list[FrequentPattern]:
    """igraph_gspan (fsm.c:2246), DEFAULT variant: mine all connected
    patterns with <= max_edges edges and aggregated DB support >=
    min_supp.  Colors are taken from the database's optional
    ``vcolor`` / ``ecolor`` columns.

    Driver holds only the pattern lattice; every support evaluation is
    one distributed embedding join over the whole database.  Seed
    colors (the reference's igraph_i_frequent_colors +
    igraph_i_build_seeds_default) come from a single aggregation over
    the edge table rather than a driver scan of every graph.
    """
    has_ec = ECOLOR in edges.columns
    has_vc = vertices is not None and VCOLOR in vertices.columns

    # orient/dedup/cache the database edge table ONCE for the whole
    # mining run; db_embeddings skips re-preparation via the marker
    prep = edges.select(GID, SRC, DST, *([ECOLOR] if has_ec else []))
    prep = prep.where(F.col(SRC) != F.col(DST))
    if not directed:
        prep = prep.unionByName(
            prep.select(GID, F.col(DST).alias(SRC), F.col(SRC).alias(DST),
                        *([ECOLOR] if has_ec else [])))
    prep = prep.distinct().persist(StorageLevel.MEMORY_AND_DISK)
    prep._fsm_prepared = True

    # frequent 1-edge seeds straight from the data: one groupBy.
    vc = (vertices.select(GID, "id", VCOLOR) if has_vc else None)
    e = edges.select(GID, SRC, DST,
                     *( [ECOLOR] if has_ec else [] ))
    if has_vc:
        e = (e.join(vc.select(GID, F.col("id").alias(SRC),
                              F.col(VCOLOR).alias("vc_s")), [GID, SRC])
             .join(vc.select(GID, F.col("id").alias(DST),
                             F.col(VCOLOR).alias("vc_d")), [GID, DST]))
    else:
        e = e.withColumn("vc_s", F.lit(0)).withColumn("vc_d", F.lit(0))
    if not has_ec:
        e = e.withColumn(ECOLOR, F.lit(0))
    if not directed:
        e = e.select(GID, F.least("vc_s", "vc_d").alias("vc_s"),
                     F.greatest("vc_s", "vc_d").alias("vc_d"), ECOLOR)
    seed_rows = (e.select("vc_s", "vc_d", ECOLOR).distinct().collect())

    seeds: list[Pattern] = []
    for r in seed_rows:
        vcs = (int(r["vc_s"]), int(r["vc_d"])) if has_vc else None
        ecs = (int(r[ECOLOR]),) if has_ec else None
        seeds.append(Pattern(edges=((0, 1),), vcolors=vcs, ecolors=ecs,
                             directed=directed))
        if directed and (has_vc or has_ec):
            pass  # directed seed (0,1) with colors as-is covers (a->b)

    vcolor_domain = sorted({c for p in seeds for c in (p.vcolors or ())}) \
        if has_vc else [None]
    ecolor_domain = sorted({c for p in seeds for c in (p.ecolors or ())}) \
        if has_ec else [None]

    results: list[FrequentPattern] = []
    frontier: list[Pattern] = []
    seen: set = set()
    for p in seeds:
        key = p.canonical_key()
        if key in seen:
            continue
        seen.add(key)
        s = db_support(prep, p, measure, vertices, induced)
        if s >= min_supp:
            results.append(FrequentPattern(p, s))
            frontier.append(p)

    nedges = 1
    while frontier and nedges < max_edges:
        nedges += 1
        candidates: list[Pattern] = []
        for p in frontier:
            candidates.extend(
                _extensions(p, vcolor_domain, ecolor_domain, directed))
        nxt: list[Pattern] = []
        for c in candidates:
            key = c.canonical_key()
            if key in seen:
                continue
            seen.add(key)
            s = db_support(prep, c, measure, vertices, induced)
            if s >= min_supp:
                results.append(FrequentPattern(c, s))
                nxt.append(c)
        frontier = nxt
    prep.unpersist()
    return results


def _extensions(p: Pattern, vdom, edom, directed) -> list[Pattern]:
    """All one-edge extensions: close an existing vertex pair, or grow
    a new vertex off any existing one, over the frequent color
    domains."""
    k = p.k
    existing = set(p.edges) | (set() if directed
                               else {(b, a) for a, b in p.edges})
    out = []
    pairs = [(i, j) for i in range(k) for j in range(k)
             if i != j and (i, j) not in existing
             and (directed or i < j)]
    grow = [(i, k) for i in range(k)] + \
           ([(k, i) for i in range(k)] if directed else [])
    for (a, b) in pairs + grow:
        new_vertex = max(a, b) == k
        for ec in edom:
            if ec is None:
                ecs = None
            elif p.ecolors is not None:
                ecs = p.ecolors + (ec,)
            else:
                ecs = tuple([0] * len(p.edges)) + (ec,)
            if not new_vertex:
                out.append(Pattern(p.edges + ((a, b),), p.vcolors, ecs,
                                   directed))
            else:
                for vcn in vdom:
                    vcs = None if vcn is None else \
                        (p.vcolors or tuple([0] * k)) + (vcn,)
                    out.append(Pattern(p.edges + ((a, b),), vcs, ecs,
                                       directed))
    return out
