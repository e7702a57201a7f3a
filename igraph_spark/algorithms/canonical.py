"""Canonical labeling + automorphism generators (bliss analog).

Reference: igraph_canonical_permutation / igraph_automorphism_group
(/root/reference/src/bliss.cc — the vendored bliss canonical-form
library).  Previously a documented non-goal; this module closes the
family with the textbook algorithm bliss itself implements
(McKay-style individualization-refinement, *Practical Graph
Isomorphism*, McKay & Piperno 2014) in two tiers:

  * **canonical_permutation / canonical_form / automorphism_generators**
    — exact canonical labeling, driver-gated (``max_vertices`` default
    64): equitable color refinement, then a backtracking search that
    individualizes one vertex of the first smallest non-singleton cell
    per level, keeps the lexicographically-least leaf adjacency as the
    canonical form, and prunes sibling branches by the orbits of the
    automorphisms discovered at equal-leaf collisions (each discovered
    automorphism is recorded; the discovered set generates the
    automorphism group).  A ``max_nodes`` search budget raises an
    honest error on pathologically symmetric inputs instead of
    spinning.
  * **wl_colors / wl_fingerprint** — the distributed scale path: 1-WL
    (color refinement) as iterated hash-join-aggregate rounds over the
    edge DataFrame, giving an isomorphism-INVARIANT per-vertex coloring
    and whole-graph fingerprint at any scale (equal fingerprints are
    necessary, not sufficient, for isomorphism — the standard WL
    contract).  One join + one aggregate per round, no driver state.

Semantics notes: refinement signatures distinguish in- and
out-neighborhoods for directed graphs; parallel edges collapse
(simple-graph contract, like the VF2 analog here); self-loops ride in
the signature as a separate flag.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, functions as F

from igraph_spark.graph import Graph, SRC, DST, ID


# --------------------------------------------------------------- driver tier

def _collect_small(graph: Graph, max_vertices: int):
    """-> (sorted vertex ids, adjacency dicts) for the driver tier."""
    vids = sorted(int(r[0]) for r in graph.vertices.select(ID).collect())
    if len(vids) > max_vertices:
        raise ValueError(
            f"canonical labeling is a driver-side search — gated at "
            f"{max_vertices} vertices (got {len(vids)}); use "
            "wl_fingerprint for a distributed isomorphism-invariant "
            "coloring at scale")
    rows = graph.edges.select(SRC, DST).distinct().collect()
    out: dict[int, set] = {v: set() for v in vids}
    inn: dict[int, set] = {v: set() for v in vids}
    loops: set[int] = set()
    for r in rows:
        u, v = int(r[SRC]), int(r[DST])
        if u == v:
            loops.add(u)
            continue
        out[u].add(v)
        inn[v].add(u)
        if not graph.directed:
            out[v].add(u)
            inn[u].add(v)
    return vids, out, inn, loops


def _refine(cells: list[list[int]], out, inn, loops) -> list[list[int]]:
    """Equitable refinement: split cells by the multiset of neighbor
    cell ids until stable.  Cell ORDER is isomorphism-invariant: new
    cells sort by (parent position, signature)."""
    while True:
        pos = {}
        for ci, cell in enumerate(cells):
            for v in cell:
                pos[v] = ci
        nxt: list[list[int]] = []
        changed = False
        for ci, cell in enumerate(cells):
            if len(cell) == 1:
                nxt.append(cell)
                continue
            sig = {}
            for v in cell:
                s = (tuple(sorted(pos[u] for u in out[v])),
                     tuple(sorted(pos[u] for u in inn[v])),
                     v in loops)
                sig.setdefault(s, []).append(v)
            if len(sig) > 1:
                changed = True
            for s in sorted(sig):
                nxt.append(sorted(sig[s]))
        cells = nxt
        if not changed:
            return cells


def _leaf_edges(order: list[int], out) -> tuple:
    """Canonical adjacency of a discrete partition: edge tuples over
    ranks (u_rank, v_rank), sorted."""
    rank = {v: i for i, v in enumerate(order)}
    return tuple(sorted((rank[u], rank[v])
                        for u in order for v in out[u]))


def _search(graph: Graph, max_vertices: int, max_nodes: int):
    """Individualization-refinement search -> (best leaf order,
    discovered automorphisms as {v: image} dicts)."""
    vids, out, inn, loops = _collect_small(graph, max_vertices)
    return _search_maps(vids, out, inn, loops, max_nodes) + (out,)


def _search_maps(vids: list[int], out, inn, loops, max_nodes: int):
    """Pure-local core of the canonical search over adjacency maps —
    no SparkSession, so it is callable inside Arrow-batched UDFs (the
    atlas generator canonicalizes thousands of tiny graphs per batch
    through this entry).  -> (best leaf order, discovered
    automorphisms)."""
    if not vids:
        return [], []
    best: dict = {"edges": None, "order": None}
    autos: list[dict] = []
    budget = {"n": 0}

    def orbit_reps(cell: list[int], path: tuple) -> list[int]:
        """One representative per orbit of ``cell`` under the
        discovered automorphisms that fix ``path`` pointwise."""
        fixing = [a for a in autos
                  if all(a[p] == p for p in path)]
        if not fixing:
            return cell
        parent = {v: v for v in vids}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a in fixing:
            for v in vids:
                ra, rb = find(v), find(a[v])
                if ra != rb:
                    parent[ra] = rb
        seen, reps = set(), []
        for v in cell:
            r = find(v)
            if r not in seen:
                seen.add(r)
                reps.append(v)
        return reps

    def recurse(cells: list[list[int]], path: tuple):
        budget["n"] += 1
        if budget["n"] > max_nodes:
            raise ValueError(
                f"canonical search exceeded max_nodes={max_nodes} "
                "(pathologically symmetric input); raise the budget or "
                "use wl_fingerprint")
        cells = _refine(cells, out, inn, loops)
        target = None
        for cell in cells:
            if len(cell) > 1 and (target is None
                                  or len(cell) < len(target)):
                target = cell
        if target is None:                       # discrete: a leaf
            order = [c[0] for c in cells]
            edges = _leaf_edges(order, out)
            if best["edges"] is None or edges < best["edges"]:
                best["edges"], best["order"] = edges, order
            elif edges == best["edges"] and order != best["order"]:
                # equal leaves differ by an automorphism:
                # v at rank i in best <-> v' at rank i here
                autos.append({b: o for b, o
                              in zip(best["order"], order)})
            return
        for v in orbit_reps(target, path):
            ind = []
            for cell in cells:
                if cell is target:
                    ind.append([v])
                    ind.append(sorted(u for u in cell if u != v))
                else:
                    ind.append(cell)
            recurse(ind, path + (v,))

    recurse([list(vids)], ())
    return best["order"] or [], autos


def canonical_permutation(graph: Graph, max_vertices: int = 64,
                          max_nodes: int = 200_000) -> DataFrame:
    """igraph_canonical_permutation (bliss.cc) analog ->
    DataFrame(id, rank): two graphs are isomorphic iff relabeling each
    by its own canonical rank yields identical edge sets."""
    spark = graph.edges.sparkSession
    order, _, _ = _search(graph, max_vertices, max_nodes)
    return spark.createDataFrame(
        [(v, i) for i, v in enumerate(order)], "id long, rank long")


def canonical_form(graph: Graph, max_vertices: int = 64,
                   max_nodes: int = 200_000) -> list[tuple[int, int]]:
    """Canonical edge list over ranks 0..n-1 (plus self-loops appended
    as (r, r)) — equal lists == isomorphic graphs."""
    order, _, out = _search(graph, max_vertices, max_nodes)
    vids = order
    rank = {v: i for i, v in enumerate(vids)}
    loops = sorted(rank[int(r[0])] for r in graph.edges
                   .where(F.col(SRC) == F.col(DST))
                   .select(SRC).distinct().collect())
    return sorted((rank[u], rank[v])
                  for u in vids for v in out[u]) + [(r, r) for r in loops]


def _collapsed_counts(g: Graph) -> tuple[int, int]:
    """(distinct non-loop edges after parallel collapse, distinct
    looped vertices) — the exact edge universe ``canonical_form``
    compares, so a precheck on these can never contradict form
    equality."""
    e = g.edges.select(SRC, DST)
    loops = (e.where(F.col(SRC) == F.col(DST))
             .select(SRC).distinct().count())
    ne = e.where(F.col(SRC) != F.col(DST))
    if not g.directed:
        ne = ne.select(F.least(SRC, DST).alias(SRC),
                       F.greatest(SRC, DST).alias(DST))
    return ne.distinct().count(), loops


def isomorphic_canonical(g1: Graph, g2: Graph,
                         max_vertices: int = 64,
                         max_nodes: int = 200_000) -> bool:
    """Whole-graph isomorphism by canonical-form equality — the bliss
    path of igraph_isomorphic, complementing the VF2 analog.

    Under the module's simple-graph contract (parallel edges collapse
    in the form), the precheck counts COLLAPSED edges, not raw
    multiplicities — a raw ecount() gate would call two multigraphs
    non-isomorphic whose collapsed forms (the thing this function
    actually compares) are identical."""
    if g1.directed != g2.directed:
        return False
    if g1.vcount() != g2.vcount():
        return False
    if _collapsed_counts(g1) != _collapsed_counts(g2):
        return False
    return (canonical_form(g1, max_vertices, max_nodes)
            == canonical_form(g2, max_vertices, max_nodes))


def automorphism_generators(graph: Graph, max_vertices: int = 64,
                            max_nodes: int = 200_000) -> list[dict]:
    """igraph_automorphism_group analog: the automorphisms discovered
    at equal-leaf collisions during the canonical search; they generate
    the automorphism group (tested against the VF2 automorphism count
    by closure in test_canonical.py)."""
    _, autos, _ = _search(graph, max_vertices, max_nodes)
    return autos


def group_order(generators: list[dict], vids: list[int]) -> int:
    """|<generators>| by breadth-first closure over permutation
    composition (driver-side; for test-scale groups)."""
    ident = tuple(vids)
    perms = {ident}
    gens = [tuple(g[v] for v in vids) for g in generators]
    frontier = [ident]
    idx = {v: i for i, v in enumerate(vids)}
    while frontier:
        nxt = []
        for p in frontier:
            for g in gens:
                q = tuple(g[idx[x]] for x in p)   # g after p
                if q not in perms:
                    perms.add(q)
                    nxt.append(q)
        frontier = nxt
    return len(perms)


# ---------------------------------------------------------- distributed tier

def wl_colors(graph: Graph, rounds: int = 3) -> DataFrame:
    """Distributed 1-WL color refinement -> DataFrame(id, color):
    ``rounds`` iterations of color[v] := hash(color[v], multiset of
    neighbor colors), each one join + one sorted-collect aggregate —
    an isomorphism-invariant vertex coloring at any scale.  Directed
    graphs hash in- and out-multisets separately."""
    e = graph.edges.select(SRC, DST).where(F.col(SRC) != F.col(DST))
    if not graph.directed:
        e = e.unionByName(e.select(F.col(DST).alias(SRC),
                                   F.col(SRC).alias(DST)))
    e = e.distinct().persist()
    deg_sig = F.xxhash64(F.lit("wl0"))
    state = graph.vertices.select(ID, deg_sig.alias("color"))
    for _ in range(rounds):
        outm = (e.join(state.select(F.col(ID).alias(DST),
                                    F.col("color").alias("nc")), DST)
                .groupBy(SRC)
                .agg(F.xxhash64(F.concat_ws(
                    ",", F.sort_array(F.collect_list("nc"))))
                    .alias("out_sig"))
                .withColumnRenamed(SRC, ID))
        inm = (e.join(state.select(F.col(ID).alias(SRC),
                                   F.col("color").alias("nc")), SRC)
               .groupBy(DST)
               .agg(F.xxhash64(F.concat_ws(
                   ",", F.sort_array(F.collect_list("nc"))))
                   .alias("in_sig"))
               .withColumnRenamed(DST, ID))
        state = (state.join(outm, ID, "left").join(inm, ID, "left")
                 .select(ID, F.xxhash64(
                     "color",
                     F.coalesce("out_sig", F.lit(0)),
                     F.coalesce("in_sig", F.lit(0))).alias("color"))
                 .localCheckpoint(eager=True))
    e.unpersist()
    return state


def wl_fingerprint(graph: Graph, rounds: int = 3) -> str:
    """Whole-graph WL fingerprint: sha256 of the sorted color
    HISTOGRAM (color values are label-independent hashes; the
    histogram is permutation-invariant).  Equal fingerprints are
    necessary — not sufficient — for isomorphism."""
    hist = (wl_colors(graph, rounds)
            .groupBy("color").agg(F.count("*").alias("n"))
            .orderBy("color").collect())
    blob = ";".join(f"{r['color']}x{r['n']}" for r in hist)
    return hashlib.sha256(blob.encode()).hexdigest()
