"""Dynamic (temporal) graphs — the reference fork's EvoMine pipeline,
src/dynamic.c: ``igraph_read_and_project_dynamic_velist``
(dynamic.c:75), ``igraph_i_compute_union_graph_projection``
(dynamic.c:568), ``igraph_compute_dynamic_union_graph_projection``
(dynamic.c:1033).

The reference reads a "velist" edge log (edges with creation/deletion
timestamps), materializes one snapshot per timestep, and merges each
consecutive snapshot pair into a labelled UNION GRAPH whose edge
colors encode the transition (present-before / present-after /
both), then mines change patterns with gspan.  The Spark shape skips
snapshot materialization entirely: each edge's lifetime interval
[create, delete) is exploded to the transitions it participates in
and the transition color is computed arithmetically — one
``explode(sequence(...))`` over the edge log, no driver loop, no
per-snapshot adjacency merge.  The projected database is the
(gid, src, dst, ecolor) layout that ``algorithms.fsm`` mines.

Transition colors follow dynamic.c:568: uncolored edges get
``0b10`` (present only at t), ``0b01`` (only at t+1), ``0b11``
(both); colored edges get ``(max_ecolor+1)*ec_t + ec_{t+1}`` with 0
standing for absent.  Vertex colors combine the same way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

GID, SRC, DST, ECOLOR = "gid", "src", "dst", "ecolor"


def read_dynamic_velist(spark: SparkSession, path: str,
                        colored: bool = False) -> tuple[DataFrame,
                                                        DataFrame]:
    """Parse the velist format (dynamic.c:62-74)::

        v <vid> [...]
        e <src> <dst> [<color>] <creation> [<deletion> [...]]

    ``deletion`` -1 (or absent) means the edge never disappears.
    Returns (vertices(id), edges(src, dst[, ecolor], t_create,
    t_delete)) — a distributed line scan, splittable like the
    edge-list readers."""
    lines = spark.read.text(path).select(
        F.split(F.trim(F.col("value")), r"\s+").alias("f"))
    verts = (lines.where(F.col("f")[0] == "v")
             .select(F.col("f")[1].cast("long").alias("id")))
    e = lines.where(F.col("f")[0] == "e")
    if colored:
        out = e.select(F.col("f")[1].cast("long").alias(SRC),
                       F.col("f")[2].cast("long").alias(DST),
                       F.col("f")[3].cast("long").alias(ECOLOR),
                       F.col("f")[4].cast("long").alias("t_create"),
                       F.coalesce(F.col("f")[5].cast("long"),
                                  F.lit(-1)).alias("t_delete"))
    else:
        out = e.select(F.col("f")[1].cast("long").alias(SRC),
                       F.col("f")[2].cast("long").alias(DST),
                       F.col("f")[3].cast("long").alias("t_create"),
                       F.coalesce(F.col("f")[4].cast("long"),
                                  F.lit(-1)).alias("t_delete"))
    return verts, out


def snapshot_edges(edges: DataFrame, timesteps: int) -> DataFrame:
    """Explode lifetime intervals into per-timestep snapshot rows ->
    DataFrame(t, src, dst[, ecolor]): edge alive at t iff
    t_create <= t < t_delete (t_delete = -1: never deleted)."""
    hi = F.when(F.col("t_delete") < 0, F.lit(timesteps - 1)) \
        .otherwise(F.least(F.col("t_delete") - 1,
                           F.lit(timesteps - 1)))
    extra = [ECOLOR] if ECOLOR in edges.columns else []
    return (edges
            .where(F.col("t_create") < timesteps)
            .where((F.col("t_delete") < 0)
                   | (F.col("t_delete") > F.col("t_create")))
            .select(F.explode(F.sequence(F.col("t_create"), hi))
                    .alias("t"), SRC, DST, *extra))


def union_graph_projection(e1: DataFrame, e2: DataFrame,
                           max_ecolor: int | None = None) -> DataFrame:
    """Merge one snapshot pair (dynamic.c:568) -> DataFrame(src, dst,
    ecolor).  Uncolored inputs get the 2-bit presence code; colored
    inputs (an ``ecolor`` column on both sides) combine base
    (max_ecolor+1)."""
    c1 = ECOLOR in e1.columns
    c2 = ECOLOR in e2.columns
    if c1 != c2:
        # the reference asserts edge colors on BOTH graphs of the pair
        # (dynamic.c union projection); silently presence-coding one
        # colored side would discard its colors.
        raise ValueError("union_graph_projection: 'ecolor' must be "
                         "present on both snapshots or neither "
                         f"(e1: {c1}, e2: {c2})")
    a = e1.select(SRC, DST, *( [F.col(ECOLOR).alias("ec1")] if c1
                               else [F.lit(1).alias("ec1")] ))
    b = e2.select(SRC, DST, *( [F.col(ECOLOR).alias("ec2")] if c1
                               else [F.lit(1).alias("ec2")] ))
    j = a.join(b, [SRC, DST], "full_outer")
    if c1:
        if max_ecolor is None:
            raise ValueError("max_ecolor required for colored snapshots")
        code = (F.coalesce(F.col("ec1"), F.lit(0))
                * F.lit(max_ecolor + 1)
                + F.coalesce(F.col("ec2"), F.lit(0)))
    else:
        code = (F.when(F.col("ec1").isNotNull(), F.lit(2))
                .otherwise(F.lit(0))
                + F.when(F.col("ec2").isNotNull(), F.lit(1))
                .otherwise(F.lit(0)))
    return j.select(SRC, DST, code.cast("long").alias(ECOLOR))


def project_dynamic(edges: DataFrame, timesteps: int,
                    max_ecolor: int | None = None) -> DataFrame:
    """The whole transition database in ONE pass (dynamic.c:1033):
    gid = t in [0, timesteps-2] is the union graph of snapshots t and
    t+1 -> DataFrame(gid, src, dst, ecolor).

    An edge with lifetime [c, d) is part of transition t iff it is
    alive at t or t+1, i.e. t in [c-1, d-1]; its color is computed
    from the two aliveness tests directly — no snapshot pair is ever
    materialized, so the plan is explode + project over the raw edge
    log (the 100 TB event-stream shape)."""
    colored = ECOLOR in edges.columns
    if colored and max_ecolor is None:
        raise ValueError("max_ecolor required for colored edge logs")
    d_excl = F.when(F.col("t_delete") < 0, F.lit(timesteps)) \
        .otherwise(F.col("t_delete"))
    lo = F.greatest(F.col("t_create") - 1, F.lit(0))
    hi = F.least(d_excl - 1, F.lit(timesteps - 2))
    live = (edges
            .where((F.col("t_delete") < 0)
                   | (F.col("t_delete") > F.col("t_create")))
            .where(lo <= hi)
            .select(SRC, DST,
                    *( [ECOLOR] if colored else [] ),
                    F.col("t_create").alias("c"), d_excl.alias("d"),
                    F.explode(F.sequence(lo, hi)).alias(GID)))
    alive_t = (F.col("c") <= F.col(GID)) & (F.col(GID) < F.col("d"))
    alive_t1 = (F.col("c") <= F.col(GID) + 1) & \
               (F.col(GID) + 1 < F.col("d"))
    if colored:
        code = (F.when(alive_t, F.col(ECOLOR)).otherwise(F.lit(0))
                * F.lit(max_ecolor + 1)
                + F.when(alive_t1, F.col(ECOLOR)).otherwise(F.lit(0)))
    else:
        code = (F.when(alive_t, F.lit(2)).otherwise(F.lit(0))
                + F.when(alive_t1, F.lit(1)).otherwise(F.lit(0)))
    # a (src,dst) pair may have several lifetime intervals (re-created
    # edges); intervals are disjoint, so per transition at most one
    # interval is alive at t and at most one at t+1 — summing the
    # per-row codes therefore reconstructs the combined code exactly
    # (including the cross case: one interval ends at t, another
    # starts at t+1)
    return (live.select(GID, SRC, DST, code.cast("long").alias(ECOLOR))
            .where(F.col(ECOLOR) > 0)
            .groupBy(GID, SRC, DST)
            .agg(F.sum(ECOLOR).cast("long").alias(ECOLOR)))


def evomine(edges: DataFrame, timesteps: int, min_supp: int,
            max_edges: int = 2, measure: str = "shallow",
            max_ecolor: int | None = None):
    """End-to-end EvoMine analog: project the edge log into the
    transition database, then mine frequent change patterns with
    gspan using exact-color label equality on transition codes.

    This matches the reference's ACTUAL EVOMINE behavior, not just its
    DEFAULT variant: in /root/reference/src/fsm.c the
    IGRAPH_GSPAN_EVOMINE case falls through to IGRAPH_GSPAN_DEFAULT at
    every branch point (seed building :1819, extension :1977, dispatch
    :2310), and the ``igraph_evomine_data_t`` wildcard parameters
    (max_vcolor/max_ecolor) are written once (:2290-2291) and never
    read — the label-string wildcard mentioned in igraph_fsm.h:47's
    comment is unimplemented there too.  Exact-color equality is
    therefore full parity.  Returns the ``gspan`` result list."""
    from igraph_spark.algorithms.fsm import gspan
    db = project_dynamic(edges, timesteps, max_ecolor)
    return gspan(db, min_supp=min_supp, max_edges=max_edges,
                 measure=measure)


def read_transactions_velist(spark: SparkSession, path: str,
                             has_vcolors: bool = False,
                             has_ecolors: bool = False,
                             has_etimes: bool = False):
    """igraph_read_transactions_velist (dynamic.c:1150): a transaction
    database file of ``t # <timestamp> [supp]`` headers, ``v <id>
    [vcolor]`` lines, and ``e <src> <dst> [ecolor] [etime]`` lines.

    Returns ``(edges, vcolors, supps)``:

      * edges: DataFrame(gid, src, dst[, ecolor][, etime]) — feeds
        ``fsm.gspan`` / support measures directly,
      * vcolors: DataFrame(gid, id, vcolor) or None,
      * supps: DataFrame(gid, t, supp) — supp -1 when absent.

    Lines are parsed distributed; only the tiny header table (one row
    per transaction) is collected to assign gid ranges, which then
    broadcast-join back onto the line table.
    """
    rdd = spark.sparkContext.textFile(path).zipWithIndex()
    lines = spark.createDataFrame(rdd, "value string, idx long")
    lines = lines.select("idx",
                         F.split(F.trim("value"), r"\s+").alias("f"))
    hdrs = (lines.where((F.col("f")[0] == "t")
                        & (F.get("f", 1) == "#"))
            .select("idx", F.get("f", 2).cast("long").alias("t"),
                    F.coalesce(F.get("f", 3).cast("long"),
                               F.lit(-1)).alias("supp"))
            .orderBy("idx").collect())
    if not hdrs:
        raise ValueError(f"invalid transactions file {path}: no 't #' "
                         f"header")
    ranges = [(gid, h["idx"], (hdrs[gid + 1]["idx"]
                               if gid + 1 < len(hdrs) else 2 ** 62),
               h["t"], h["supp"]) for gid, h in enumerate(hdrs)]
    rdf = spark.createDataFrame(
        ranges, "gid long, lo long, hi long, t long, supp long")
    body = lines.join(F.broadcast(rdf),
                      (F.col("idx") > F.col("lo"))
                      & (F.col("idx") < F.col("hi")))
    ecols = [F.get("f", 1).cast("long").alias(SRC),
             F.get("f", 2).cast("long").alias(DST)]
    pos = 3
    if has_ecolors:
        ecols.append(F.get("f", pos).cast("long").alias(ECOLOR))
        pos += 1
    if has_etimes:
        ecols.append(F.get("f", pos).cast("long").alias("etime"))
    edges = body.where(F.col("f")[0] == "e").select("gid", *ecols)
    vcolors = None
    if has_vcolors:
        vcolors = (body.where(F.col("f")[0] == "v")
                   .select("gid", F.get("f", 1).cast("long").alias("id"),
                           F.get("f", 2).cast("long").alias("vcolor")))
    supps = rdf.select("gid", "t", "supp")
    return edges, vcolors, supps


def write_avm(path: str, n: int, t: int, avg_degree: int = 4,
              opinion_prior: float = 0.5, rewiring_p: float = 0.5,
              rewirings_per_t: int = 1, seed: int = 42) -> None:
    """igraph_write_avm / _collected (dynamic.c:1496): the adaptive
    voter model snapshot stream — ER(n, avg_degree*n/2) start, opinions
    in {1, 2} ~ Bernoulli(opinion_prior); per timestep pick a
    discordant edge, pick a resolver endpoint, then with probability
    ``rewiring_p`` rewire the resolver to a random same-opinion vertex,
    else the resolver adopts the other's opinion.  Snapshots are
    written as ``t # <k>`` + colored-graph blocks.

    Deviations from the reference, both documented: the PRNG is
    numpy's seeded generator (the reference calls srand(time(NULL)) —
    unreproducible), and the reference's possibly-infinite rejection
    loops (its own TODO) are replaced by sampling from the
    materialized discordant-edge / same-opinion sets, raising when
    empty (consensus) instead of spinning.
    """
    import numpy as np
    rng = np.random.default_rng(seed)
    m = int(avg_degree * n / 2)
    edges: list = []
    eset = set()
    while len(edges) < m:  # ER G(n,m) without loops/multi-edges
        a, b = int(rng.integers(0, n)), int(rng.integers(0, n))
        if a == b:
            continue
        key = (a, b) if a < b else (b, a)
        if key in eset:
            continue
        eset.add(key)
        edges.append(key)
    opinions = 1 + (rng.random(n) < opinion_prior).astype(int)

    def block(fh, k):
        fh.write(f"t # {k}\n")
        for v in range(n):
            fh.write(f"v {v} {int(opinions[v])}\n")
        for a, b in sorted(eset):
            fh.write(f"e {a} {b}\n")

    with open(path, "w") as fh:
        block(fh, 0)
        for step in range(t):
            for _ in range(rewirings_per_t):
                disc = [e for e in eset
                        if opinions[e[0]] != opinions[e[1]]]
                if not disc:
                    raise ValueError(
                        f"consensus reached at timestep {step}: no "
                        f"discordant edge to resolve")
                a, b = disc[int(rng.integers(0, len(disc)))]
                if int(rng.integers(0, 2)):
                    resolv, other = a, b
                else:
                    resolv, other = b, a
                if rng.random() < rewiring_p:
                    same = [v for v in range(n)
                            if v != resolv
                            and opinions[v] == opinions[resolv]
                            and (min(v, resolv), max(v, resolv))
                            not in eset]
                    if not same:
                        continue  # no rewiring target; skip the event
                    v_new = same[int(rng.integers(0, len(same)))]
                    eset.discard((min(a, b), max(a, b)))
                    eset.add((min(resolv, v_new), max(resolv, v_new)))
                else:
                    opinions[resolv] = opinions[other]
            block(fh, step + 1)


def citing_evolved_network(path: str, t: int, n: int,
                           edges_per_step: int = 1, m: float = 2.0,
                           seed: int = 42) -> None:
    """igraph_citing_evolved_network (dynamic.c:1585): a Price-model
    citation stream — an initial cited-type seed graph on ``n``
    vertices, then ``t`` evolution steps where vertex ``n + i`` cites
    ``max(0, floor(N(m, 0.5)))`` targets chosen proportional to
    ``1 + in_degree`` (the classic vertex-or-edge-endpoint index
    trick); every step appends a ``t # <k>`` snapshot block.

    Deviations, documented: seeded numpy PRNG (the reference seeds
    from time(NULL)), and the reference's evolution loop increments
    the wrong variable (``for(i=0; i<t; t++)`` — it never terminates);
    this build runs the intended ``t`` steps.
    """
    import numpy as np
    rng = np.random.default_rng(seed)
    edges: list = []
    # seed graph: each vertex v>=1 cites one earlier vertex chosen
    # proportional to 1 + in_degree (igraph_cited_type_game with one
    # type reduces to exactly this)
    for v in range(1, n):
        for _ in range(edges_per_step):
            ridx = int(rng.integers(0, v + len(edges)))
            target = ridx if ridx < v else edges[ridx - v][1]
            edges.append((v, target))

    def block(fh, k, vcount):
        fh.write(f"t # {k}\n")
        for v in range(vcount):
            fh.write(f"v {v}\n")
        for a, b in edges:
            fh.write(f"e {a} {b}\n")

    with open(path, "w") as fh:
        block(fh, 0, n + t)
        for i in range(t):
            v_new = n + i
            out_degree = max(0, int(np.floor(rng.normal(m, 0.5))))
            vcount = v_new  # citable: all existing vertices
            for _ in range(out_degree):
                ridx = int(rng.integers(0, vcount + len(edges)))
                target = ridx if ridx < vcount else edges[ridx - vcount][1]
                edges.append((v_new, target))
            block(fh, i + 1, n + t)
