"""Layouts — igraph_layout_circle / _grid / _random /
_fruchterman_reingold (/root/reference/src/layout.c).

Deterministic coordinate generators (pure column arithmetic) plus a
BSP force-directed layout: one Fruchterman-Reingold iteration is an
all-pairs repulsion aggregate (a cross join, O(n^2) per round — the
reference's own complexity) + an edge-attraction aggregate + a
temperature-capped displacement.  Hash-seeded initial positions make
every layout reproducible at any parallelism.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

from igraph_spark.graph import Graph, SRC, DST, ID


def _force_table(pos: DataFrame, sym: DataFrame, k: float, ascale: float,
                 repulsion: str, cell_factor: float,
                 dims: tuple = ("x", "y")) -> DataFrame:
    """One force evaluation -> DataFrame(i, fx, fy[, fz]): FR repulsion
    ``k^2/d`` between pairs + attraction ``d^2/k`` (scaled by
    ``ascale``) along edges, in 2 or 3 dimensions (``dims``).

    ``repulsion="exact"``: the all-pairs cross-join aggregate with the
    edge term fused in (the reference FR loop's own O(n^2) round,
    layout.c).

    ``repulsion="grid"``: the FR paper's grid variant, which is also
    the shape of DrL's density grid (/root/reference/src/
    DensityGrid.cpp — short-range repulsion from a spatial bin
    structure): positions are binned into cells of side
    ``cell_factor * k``; repulsion is computed EXACTLY against every
    vertex in the surrounding 3x3 cell block (so every pair closer
    than one cell side is included) and is zero beyond — ``k^2/d``
    decays fast enough that the truncated tail only loses the weak
    global expansion pressure.  Execution shape: the j-side is
    replicated into its 9 neighbor cells (two explodes), then a plain
    equi-join on the cell key + hash aggregate — O(n * occupancy)
    rows, no cross join, and the cell key join parallelizes on any
    cluster.  Attraction runs as a separate O(m) edge join (edges may
    span cells).
    """
    fcols = ["f" + c for c in dims]
    a = pos.select(F.col(ID).alias("i"),
                   *[F.col(c).alias(c + "i") for c in dims])
    b = pos.select(F.col(ID).alias("j"),
                   *[F.col(c).alias(c + "j") for c in dims])
    diffs = [F.col(c + "i") - F.col(c + "j") for c in dims]
    d2 = diffs[0] * diffs[0]
    for dd in diffs[1:]:
        d2 = d2 + dd * dd
    d2 = d2 + F.lit(1e-9)
    d = F.sqrt(d2)
    if repulsion == "exact":
        fused = [
            (dd / d2 * (k * k)
             + F.when(F.col("is_e"),
                      -dd * d / k * F.lit(ascale)).otherwise(0.0))
            for dd in diffs]
        return (a.crossJoin(b).where(F.col("i") != F.col("j"))
                .join(sym, ["i", "j"], "left")
                .withColumn("is_e", F.coalesce("is_e", F.lit(False)))
                .groupBy("i")
                .agg(*[F.sum(fp).alias(fc)
                       for fp, fc in zip(fused, fcols)]))
    if repulsion != "grid":
        raise ValueError(f"unknown repulsion mode {repulsion!r}")
    s = float(cell_factor * k)
    ca = a.select("i", *[c + "i" for c in dims],
                  *[F.floor(F.col(c + "i") / s).alias("c" + c)
                    for c in dims])
    off = F.array(F.lit(-1), F.lit(0), F.lit(1))
    cb = b.select("j", *[c + "j" for c in dims],
                  *[F.floor(F.col(c + "j") / s).alias("b" + c)
                    for c in dims])
    for c in dims:  # one explode per dimension: 3^len(dims) replicas
        cb = cb.select("*", F.explode(off).alias("o" + c))
    cb = cb.select("j", *[c + "j" for c in dims],
                   *[(F.col("b" + c) + F.col("o" + c)).alias("c" + c)
                     for c in dims])
    ckeys = ["c" + c for c in dims]
    rep = (ca.join(cb, ckeys).where(F.col("i") != F.col("j"))
           .groupBy("i")
           .agg(*[F.sum(dd / d2 * (k * k)).alias(fc)
                  for dd, fc in zip(diffs, fcols)]))
    att = (sym.select("i", "j")
           .join(a, "i").join(b, "j")
           .groupBy("i")
           .agg(*[F.sum(-dd * d / k * F.lit(ascale)).alias(fc)
                  for dd, fc in zip(diffs, fcols)]))
    return (rep.unionByName(att).groupBy("i")
            .agg(*[F.sum(fc).alias(fc) for fc in fcols]))


def _resolve_repulsion(repulsion: str, n: int,
                       exact_threshold: int = 4096) -> str:
    """``auto`` -> exact below ``exact_threshold`` vertices (cheap and
    deterministic at fixture scale), grid above (the 100x-scale path:
    O(n) per round instead of O(n^2))."""
    if repulsion == "auto":
        return "exact" if n <= exact_threshold else "grid"
    return repulsion


def _ranked(graph: Graph) -> DataFrame:
    """(id, rank) with rank = 0-based position in ascending id order
    (the reference places vertices in vertex-id order).  The global
    window runs over the vertex table — fine for layout-sized outputs
    (a layout is inherently collected for rendering)."""
    return graph.vertices.select(
        ID, (F.row_number().over(Window.orderBy(ID)) - 1).alias("rank"))


def layout_circle(graph: Graph) -> DataFrame:
    """igraph_layout_circle: vertex k at angle 2*pi*k/n."""
    n = graph.vcount()
    ang = F.col("rank") * (2.0 * math.pi / max(n, 1))
    return _ranked(graph).select(ID, F.cos(ang).alias("x"),
                                 F.sin(ang).alias("y"))


def layout_grid(graph: Graph, width: int = 0) -> DataFrame:
    """igraph_layout_grid: row-major grid, auto width = ceil(sqrt(n))."""
    n = graph.vcount()
    w = width if width > 0 else int(math.ceil(math.sqrt(max(n, 1))))
    return _ranked(graph).select(
        ID, (F.col("rank") % w).cast("double").alias("x"),
        F.floor(F.col("rank") / w).cast("double").alias("y"))


def layout_random(graph: Graph, seed: int = 42) -> DataFrame:
    """igraph_layout_random on [-1, 1]^2, hash-uniform (scale-free:
    no ranking, no shuffle)."""
    def u(salt: int) -> F.Column:
        h = F.xxhash64(F.col(ID), F.lit(seed), F.lit(salt))
        return (h.cast("double") / F.lit(2.0 ** 63))
    return graph.vertices.select(ID, u(0).alias("x"), u(1).alias("y"))


def layout_random_3d(graph: Graph, seed: int = 42) -> DataFrame:
    """igraph_layout_random_3d (/root/reference/src/layout.c:110) on
    [-1, 1]^3, hash-uniform (scale-free: no ranking, no shuffle)."""
    def u(salt: int) -> F.Column:
        h = F.xxhash64(F.col(ID), F.lit(seed), F.lit(salt))
        return (h.cast("double") / F.lit(2.0 ** 63))
    return graph.vertices.select(ID, u(0).alias("x"), u(1).alias("y"),
                                 u(2).alias("z"))


def layout_grid_3d(graph: Graph, width: int = 0,
                   height: int = 0) -> DataFrame:
    """igraph_layout_grid_3d (/root/reference/src/layout.c:339):
    row-major 3-D grid; auto width = height = ceil(n^(1/3))."""
    n = graph.vcount()
    if width <= 0 and height <= 0:
        width = height = int(math.ceil(max(n, 1) ** (1.0 / 3)))
    elif width <= 0:
        width = int(math.ceil(math.sqrt(max(n, 1) / float(height))))
    elif height <= 0:
        height = int(math.ceil(math.sqrt(max(n, 1) / float(width))))
    r = F.col("rank")
    return _ranked(graph).select(
        ID, (r % width).cast("double").alias("x"),
        (F.floor(r / width) % height).cast("double").alias("y"),
        F.floor(r / (width * height)).cast("double").alias("z"))


def layout_sphere(graph: Graph) -> DataFrame:
    """igraph_layout_sphere (/root/reference/src/layout.c:246; Saff &
    Kuijlaars 1997) -> DataFrame(id, x, y, z): near-uniform points on
    the unit sphere.

    The reference's phi recurrence ``phi_i = fmod(phi_{i-1} + 3.6 /
    sqrt(n (1-h_i^2)), 2pi)`` is a modular prefix sum (fmod commutes
    with addition), so it distributes as a cumulative-sum window over
    the rank order — no sequential driver loop."""
    n = graph.vcount()
    ranked = _ranked(graph)
    if n < 2:
        # n==1: theta=pi, phi=0 (layout.c:254-256) -> (sin(pi), 0, -1)
        return ranked.select(ID, F.lit(math.sin(math.pi)).alias("x"),
                             F.lit(0.0).alias("y"),
                             F.lit(-1.0).alias("z"))
    r = F.col("rank")
    h = -1.0 + 2.0 * r / F.lit(float(n - 1))
    # phi increments: rank 0 (theta=pi) and rank n-1 (theta=0) carry
    # phi=0 in the reference; interior ranks accumulate the deltas of
    # ranks 1..i (delta_1 added on top of phi_0 = 0)
    delta = F.when((r >= 1) & (r <= n - 2),
                   3.6 / F.sqrt(F.lit(float(n)) * (1.0 - h * h))) \
        .otherwise(F.lit(0.0))
    cum = F.sum(delta).over(
        Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, 0))
    phi = F.when(r == n - 1, F.lit(0.0)).otherwise(cum % (2.0 * math.pi))
    theta = (F.when(r == 0, F.lit(math.pi))
             .when(r == n - 1, F.lit(0.0))
             .otherwise(F.acos(h)))
    return ranked.select(
        ID,
        (F.cos(phi) * F.sin(theta)).alias("x"),
        (F.sin(phi) * F.sin(theta)).alias("y"),
        F.cos(theta).alias("z"))


def layout_fruchterman_reingold(graph: Graph, iterations: int = 50,
                                seed: int = 42, repulsion: str = "auto",
                                cell_factor: float = 2.0) -> DataFrame:
    """igraph_layout_fruchterman_reingold -> DataFrame(id, x, y).

    Classic FR: repulsion k^2/d between all pairs, attraction d^2/k
    along edges, displacement capped by a linearly cooling temperature.

    ``repulsion``: "exact" = the reference's all-pairs O(n^2) round;
    "grid" = the FR paper's own grid variant (short-range repulsion
    within a 3x3 block of cells of side ``cell_factor * k``), O(n *
    occupancy) per round — the 100x-scale path; "auto" (default)
    picks exact below 4096 vertices and grid above.  A large
    ``cell_factor`` makes grid degenerate to exact (every pair lands
    in the neighborhood), which the tolerance test exploits.
    """
    schedule = [(0.1 * (1.0 - it / iterations) + 1e-6, 1.0)
                for it in range(iterations)]
    return _fr_loop(graph, schedule, seed, repulsion, cell_factor,
                    ("x", "y"), "fr")


def _fr_loop(graph: Graph, schedule: list, seed: int, repulsion: str,
             cell_factor: float, dims: tuple, algo: str) -> DataFrame:
    """Shared FR-kernel BSP loop (FR 2-D/3-D and DrL): per round, one
    force pass (exact: fused all-pairs aggregate; grid: cell-key
    equi-join + edge join, _force_table) and a temperature-capped move
    applied in the same projection; the runner owns persist/rotation +
    lineage truncation.  ``schedule`` = [(temp, ascale), ...]."""
    from igraph_spark.checkpointing import SuperstepRunner
    spark = graph.edges.sparkSession
    n = max(graph.vcount(), 1)
    k = math.sqrt(1.0 / n)
    e = (graph.edges.select(SRC, DST).where(F.col(SRC) != F.col(DST))
         .distinct())
    sym = (e.unionByName(e.select(F.col(DST).alias(SRC),
                                  F.col(SRC).alias(DST)))
           .select(F.col(SRC).alias("i"), F.col(DST).alias("j"),
                   F.lit(True).alias("is_e"))
           .localCheckpoint(eager=True))

    mode = _resolve_repulsion(repulsion, n)
    init = (layout_random(graph, seed) if len(dims) == 2
            else layout_random_3d(graph, seed))
    runner = SuperstepRunner(spark, checkpoint_every=5)
    pos, start, _ = runner.start(
        init, params={"algo": algo, "seed": seed, "iters": len(schedule)})
    fcols = ["f" + c for c in dims]
    for it in range(start, len(schedule)):
        temp, ascale = schedule[it]
        forces = _force_table(pos, sym, k, ascale, mode, cell_factor, dims)
        mag2 = F.col(fcols[0]) * F.col(fcols[0])
        for fc in fcols[1:]:
            mag2 = mag2 + F.col(fc) * F.col(fc)
        mag = F.sqrt(mag2) + F.lit(1e-12)
        step = F.least(mag, F.lit(temp))
        new = (pos.join(forces, pos[ID] == forces["i"], "left").drop("i")
               .select(ID,
                       *[(F.col(c) + F.coalesce(F.col(fc) / mag * step,
                                                F.lit(0.0))).alias(c)
                         for c, fc in zip(dims, fcols)]))
        new = new.persist()
        new.count()
        pos = runner.advance(it, new)
    return pos


def layout_fruchterman_reingold_3d(graph: Graph, iterations: int = 50,
                                   seed: int = 42, repulsion: str = "auto",
                                   cell_factor: float = 2.0) -> DataFrame:
    """igraph_layout_fruchterman_reingold_3d (/root/reference/src/
    layout.c, the 3-D FR variant) -> DataFrame(id, x, y, z).  Same
    kernel and repulsion modes as the 2-D layout; the grid path bins
    into 3x3x3 neighborhoods (27 halo replicas)."""
    schedule = [(0.1 * (1.0 - it / iterations) + 1e-6, 1.0)
                for it in range(iterations)]
    return _fr_loop(graph, schedule, seed, repulsion, cell_factor,
                    ("x", "y", "z"), "fr3d")


def layout_kamada_kawai(graph: Graph, iterations: int = 200,
                        vertex_threshold: int = 3000,
                        seed: int = 42) -> DataFrame:
    """igraph_layout_kamada_kawai (/root/reference/src/layout_kk.c:72)
    -> DataFrame(id, x, y).

    Minimizes the same stress objective as the reference —
    ``sum_{i<j} (|p_i - p_j| - d_ij)^2 / d_ij^2`` over all-pairs graph
    distances d — but by SMACOF stress majorization (guaranteed
    monotone descent, deterministic) instead of the reference's
    gradient loop.  All-pairs distances are dense O(n^2) state BY
    DEFINITION of the objective, so this is a driver-core layout like
    the reference itself (``vertex_threshold`` guards it); a layout is
    collected for rendering anyway.  Disconnected pairs get
    2 x the finite diameter (finite proxy, keeps components apart)."""
    import numpy as np

    spark = graph.edges.sparkSession
    vids = sorted(int(r[0]) for r in graph.vertices.select(ID).collect())
    n = len(vids)
    if n > vertex_threshold:
        raise ValueError(
            f"kamada-kawai is an all-pairs layout: {n} vertices > "
            f"vertex_threshold={vertex_threshold}; use "
            "layout_fruchterman_reingold at scale")
    if n == 0:
        return spark.createDataFrame([], f"{ID} long, x double, y double")
    idx = {v: i for i, v in enumerate(vids)}
    und = (graph.edges.select(SRC, DST).collect())
    adj = [[] for _ in range(n)]
    for r in und:
        u, v = idx[int(r[SRC])], idx[int(r[DST])]
        if u != v:
            adj[u].append(v)
            adj[v].append(u)
    # BFS all-pairs
    INF = float("inf")
    D = np.full((n, n), INF)
    for s in range(n):
        D[s, s] = 0.0
        frontier = [s]
        dist = 0
        seen = {s}
        while frontier:
            dist += 1
            nxt = []
            for u in frontier:
                for w in adj[u]:
                    if w not in seen:
                        seen.add(w)
                        D[s, w] = dist
                        nxt.append(w)
            frontier = nxt
    finite = D[np.isfinite(D)]
    dmax = float(finite.max()) if finite.size else 1.0
    D[~np.isfinite(D)] = 2.0 * max(dmax, 1.0)
    np.fill_diagonal(D, 0.0)

    # deterministic start on a circle + hash jitter
    ang = 2.0 * math.pi * np.arange(n) / max(n, 1)
    P = np.stack([np.cos(ang), np.sin(ang)], axis=1) * max(dmax, 1.0) / 2
    rng = np.random.default_rng(seed)
    P += rng.standard_normal((n, 2)) * 1e-3

    W = np.zeros((n, n))
    nz = D > 0
    W[nz] = 1.0 / (D[nz] ** 2)
    # Guttman transform: X <- V+ B(X) X with V = diag(row sums) - W;
    # V+ = (V + J/n)^-1 - J/n (J = all-ones) handles the constant
    # nullspace exactly.  One n x n inverse, computed once.
    V = np.diag(W.sum(axis=1)) - W
    J = np.full((n, n), 1.0 / n)
    Vp = np.linalg.inv(V + J) - J if n > 1 else np.ones((1, 1))
    for _ in range(iterations):
        diff = P[:, None, :] - P[None, :, :]
        dist = np.sqrt((diff ** 2).sum(-1))
        np.fill_diagonal(dist, 1.0)
        B = -W * D / np.maximum(dist, 1e-12)
        np.fill_diagonal(B, 0.0)
        np.fill_diagonal(B, -B.sum(axis=1))
        P = Vp @ (B @ P)
    rows = [(vids[i], float(P[i, 0]), float(P[i, 1])) for i in range(n)]
    return spark.createDataFrame(rows, f"{ID} long, x double, y double")


def layout_sugiyama(graph: Graph, layers: DataFrame | None = None,
                    hgap: float = 1.0, vgap: float = 1.0,
                    maxiter: int = 100) -> DataFrame:
    """igraph_layout_sugiyama (/root/reference/src/sugiyama.c:305)
    -> DataFrame(id, x, y, layer) for the ORIGINAL vertices (dummy
    bend vertices are internal here; the reference returns them too).

    Stages, as in the reference: (1) cycles broken by reversing the
    package feedback_arc_set arcs; (2) layer = longest-path depth
    (BSP max-propagation, rounds = DAG depth); (3) edges spanning
    multiple layers get dummy vertices; (4) ``maxiter`` barycenter
    ordering sweeps (mean neighbor rank in the layer above, then
    re-rank — a groupBy + window per sweep); (5) x = centered rank *
    hgap, y = layer * vgap.  Every stage is column algebra, so layer
    assignment and ordering scale; sweeps are a fixed driver loop."""
    spark = graph.edges.sparkSession
    e = graph.edges.select(SRC, DST).where(F.col(SRC) != F.col(DST))
    if graph.directed:
        from igraph_spark.algorithms.feedback import feedback_arc_set
        fas = feedback_arc_set(graph).select(
            SRC, DST, F.lit(True).alias("rev"))
        e = (e.join(fas, [SRC, DST], "left")
             .select(F.when(F.col("rev"), F.col(DST)).otherwise(F.col(SRC))
                     .alias(SRC),
                     F.when(F.col("rev"), F.col(SRC)).otherwise(F.col(DST))
                     .alias(DST)))
    else:
        # undirected: orient low -> high id (acyclic by construction)
        e = e.select(F.least(SRC, DST).alias(SRC),
                     F.greatest(SRC, DST).alias(DST))
    e = e.distinct().persist()

    # ---- longest-path layering (BSP fixpoint over a DAG)
    layer = (layers.select(ID, F.col(layers.columns[1]).alias("layer"))
             if layers is not None else None)
    if layer is None:
        layer = graph.vertices.select(ID, F.lit(0).alias("layer"))
        for _ in range(64):                 # depth cap; DAG depth rounds
            prop = (e.join(layer.select(F.col(ID).alias(SRC),
                                        F.col("layer").alias("pl")), SRC)
                    .groupBy(F.col(DST).alias(ID))
                    .agg((F.max("pl") + 1).alias("nl")))
            new = (layer.join(prop, ID, "left")
                   .select(ID, F.greatest(
                       "layer", F.coalesce("nl", F.lit(0))).alias("layer")))
            new = new.localCheckpoint(eager=False)
            changed = (new.join(layer.withColumnRenamed("layer", "ol"), ID)
                       .where(F.col("layer") != F.col("ol")).count())
            layer = new
            if changed == 0:
                break

    # ---- dummy vertices on long edges: edge (u,v) spanning k>1 layers
    # becomes a chain u -> d1 -> ... -> d{k-1} -> v
    le = (e.join(layer.select(F.col(ID).alias(SRC),
                              F.col("layer").alias("ls")), SRC)
          .join(layer.select(F.col(ID).alias(DST),
                             F.col("layer").alias("ld")), DST))
    # unique negative ids for dummies: hash of (src,dst,step)
    chain = (le.where(F.col("ld") - F.col("ls") > 1)
             .select(SRC, DST, "ls", "ld",
                     F.explode(F.sequence(F.lit(1),
                                          F.col("ld") - F.col("ls") - 1))
                     .alias("step")))
    dummy = chain.select(
        (-F.abs(F.xxhash64(SRC, DST, "step"))).alias(ID),
        (F.col("ls") + F.col("step")).alias("layer"))
    seg_mid = chain.select(
        F.when(F.col("step") == 1, F.col(SRC))
        .otherwise(-F.abs(F.xxhash64(SRC, DST, F.col("step") - 1)))
        .alias(SRC),
        (-F.abs(F.xxhash64(SRC, DST, "step"))).alias(DST))
    seg_last = (le.where(F.col("ld") - F.col("ls") > 1)
                .select((-F.abs(F.xxhash64(
                    SRC, DST, F.col("ld") - F.col("ls") - 1)))
                    .alias(SRC), F.col(DST)))
    short = (le.where(F.col("ld") - F.col("ls") <= 1)
             .select(SRC, DST))
    ext_e = short.unionByName(seg_mid).unionByName(seg_last).persist()
    ext_v = (layer.unionByName(dummy)
             .groupBy(ID).agg(F.max("layer").alias("layer")).persist())

    # ---- barycenter crossing-minimization sweeps
    w = Window.partitionBy("layer").orderBy("pos", ID)
    order = ext_v.select(ID, "layer",
                         F.col(ID).cast("double").alias("pos"))
    order = order.select(ID, "layer",
                         F.row_number().over(w).cast("double").alias("pos"))
    down = ext_e.select(F.col(SRC).alias("nb"), F.col(DST).alias(ID))
    up = ext_e.select(F.col(DST).alias("nb"), F.col(SRC).alias(ID))
    sweeps = min(maxiter, 20)
    for it in range(sweeps):
        nbrs = down if it % 2 == 0 else up
        bary = (nbrs.join(order.select(F.col(ID).alias("nb"),
                                       F.col("pos").alias("np")), "nb")
                .groupBy(ID).agg(F.avg("np").alias("bary")))
        order = (order.join(bary, ID, "left")
                 .select(ID, "layer",
                         F.coalesce("bary", "pos").alias("pos")))
        order = order.select(
            ID, "layer",
            F.row_number().over(w).cast("double").alias("pos"))
        order = order.localCheckpoint(eager=False)

    cnt = order.groupBy("layer").agg(F.count("*").alias("cnt"))
    out = (order.join(cnt, "layer")
           .where(F.col(ID) >= 0)
           .select(ID,
                   ((F.col("pos") - 1 - (F.col("cnt") - 1) / 2.0)
                    * hgap).alias("x"),
                   (F.col("layer") * vgap).cast("double").alias("y"),
                   F.col("layer").cast("long").alias("layer")))
    e.unpersist()
    ext_e.unpersist()
    ext_v.unpersist()
    return out


def layout_drl(graph: Graph, iterations: int = 60,
               seed: int = 42, repulsion: str = "auto",
               cell_factor: float = 2.0) -> DataFrame:
    """igraph_layout_drl (/root/reference/src/drl_layout.cpp:87,
    drl_graph.cpp) -> DataFrame(id, x, y).

    DrL is a phased force scheduler over an FR-style kernel: liquid ->
    expansion -> cool-down -> crunch -> simmer, each phase with its own
    temperature and attraction scaling (drl_parse.cpp default
    schedule).  This build drives the shared force round
    (``_force_table``) through DrL's phase schedule.  ``repulsion=
    "grid"`` is the analog of the reference's own DensityGrid
    short-range repulsion (/root/reference/src/DensityGrid.cpp) —
    cell-binned, O(n * occupancy) per round; "exact" is the all-pairs
    aggregate; "auto" (default) switches at 4096 vertices.  Edge
    cutting is not implemented."""
    # (share of iterations, temperature scale, attraction scale) — the
    # default DrL schedule's proportions (liquid/expansion/cooldown/
    # crunch/simmer = 25/25/25/10/15, attraction rising then settling)
    phases = [(0.25, 2.0, 1.0), (0.25, 1.5, 2.0), (0.25, 0.7, 1.0),
              (0.10, 0.3, 1.0), (0.15, 0.1, 0.5)]
    raw = []
    for share, tscale, ascale in phases:
        raw += [(tscale, ascale)] * max(1, int(round(share * iterations)))
    raw = raw[:max(iterations, len(phases))]
    schedule = [(0.1 * tscale * (1.0 - it / len(raw)) + 1e-6, ascale)
                for it, (tscale, ascale) in enumerate(raw)]
    return _fr_loop(graph, schedule, seed, repulsion, cell_factor,
                    ("x", "y"), "drl")


def layout_gem(graph: Graph, iterations: int = 40,
               seed: int = 42, repulsion: str = "auto",
               cell_factor: float = 2.0) -> DataFrame:
    """igraph_layout_gem (/root/reference/src/layout_gem.c; Frick,
    Ludwig & Mehldau 1995) -> DataFrame(id, x, y).

    GEM adds a gravitational pull toward the layout barycenter and a
    deterministic per-round shake on top of spring forces.  The
    reference updates one randomly-chosen vertex at a time with
    per-vertex adaptive temperatures; a BSP engine updates all vertices
    synchronously per round with a shared cooling schedule (documented
    deviation — the sequential single-vertex walk has no
    order-independent distributed formulation).  ``repulsion`` works
    as in layout_fruchterman_reingold (grid = cell-binned short-range
    pair forces; gravity and shake are O(n) either way)."""
    from igraph_spark.checkpointing import SuperstepRunner
    spark = graph.edges.sparkSession
    n = max(graph.vcount(), 1)
    k = math.sqrt(1.0 / n)
    gamma = 1.0 / 16.0            # gravitational constant, layout_gem.c
    e = (graph.edges.select(SRC, DST).where(F.col(SRC) != F.col(DST))
         .distinct())
    sym = (e.unionByName(e.select(F.col(DST).alias(SRC),
                                  F.col(SRC).alias(DST)))
           .select(F.col(SRC).alias("i"), F.col(DST).alias("j"),
                   F.lit(True).alias("is_e"))
           .localCheckpoint(eager=True))
    runner = SuperstepRunner(spark, checkpoint_every=5)
    pos, start, _ = runner.start(
        layout_random(graph, seed),
        params={"algo": "gem", "seed": seed, "iters": iterations})
    mode = _resolve_repulsion(repulsion, n)
    for it in range(start, iterations):
        temp = 0.1 * (1.0 - it / iterations) + 1e-6
        cen = pos.agg(F.avg("x").alias("cx"), F.avg("y").alias("cy"))
        forces = _force_table(pos, sym, k, 1.0, mode, cell_factor)
        # gravity toward barycenter + deterministic hash shake
        shake_x = (F.xxhash64(F.col(ID), F.lit(seed), F.lit(1000 + it))
                   .cast("double") / F.lit(2.0 ** 63)) * temp * 0.1
        shake_y = (F.xxhash64(F.col(ID), F.lit(seed), F.lit(2000 + it))
                   .cast("double") / F.lit(2.0 ** 63)) * temp * 0.1
        withf = (pos.join(forces, pos[ID] == forces["i"], "left")
                 .drop("i").crossJoin(cen)
                 .select(ID, "x", "y",
                         (F.coalesce("fx", F.lit(0.0))
                          + (F.col("cx") - F.col("x")) * gamma
                          + shake_x).alias("fx"),
                         (F.coalesce("fy", F.lit(0.0))
                          + (F.col("cy") - F.col("y")) * gamma
                          + shake_y).alias("fy")))
        mag = F.sqrt(F.col("fx") * F.col("fx")
                     + F.col("fy") * F.col("fy")) + F.lit(1e-12)
        step = F.least(mag, F.lit(temp))
        new = withf.select(
            ID, (F.col("x") + F.col("fx") / mag * step).alias("x"),
            (F.col("y") + F.col("fy") / mag * step).alias("y"))
        new = new.persist()
        new.count()
        pos = runner.advance(it, new)
    return pos


def layout_davidson_harel(graph: Graph, maxiter: int = 10,
                          fineiter: int = 30, cool_fact: float = 0.75,
                          weight_node_dist: float = 1.0,
                          weight_edge_lengths: float | None = None,
                          weight_edge_crossings: float | None = None,
                          vertex_threshold: int = 500,
                          seed: int = 42) -> DataFrame:
    """igraph_layout_davidson_harel (/root/reference/src/layout_dh.c;
    Davidson & Harel 1996) -> DataFrame(id, x, y).

    Simulated annealing over single-vertex moves minimizing
      E = w_nd * sum 1/d(u,v)^2  +  w_el * sum d(edge)^2
        + w_cr * #edge-crossings,
    with the default weights derived from graph density like the
    reference's high-level wrapper.  Sequential BY DEFINITION (each
    Metropolis move conditions on every other current position), so a
    driver core gated by ``vertex_threshold``; deterministic via
    seeded PCG64."""
    import numpy as np

    spark = graph.edges.sparkSession
    vids = sorted(int(r[0]) for r in graph.vertices.select(ID).collect())
    n = len(vids)
    if n > vertex_threshold:
        raise ValueError(
            f"davidson-harel annealing is sequential: {n} vertices > "
            f"vertex_threshold={vertex_threshold}")
    if n == 0:
        return spark.createDataFrame([], f"{ID} long, x double, y double")
    idx = {v: i for i, v in enumerate(vids)}
    edges = [(idx[int(r[SRC])], idx[int(r[DST])])
             for r in graph.edges.select(SRC, DST).collect()
             if int(r[SRC]) != int(r[DST])]
    density = 2.0 * len(edges) / max(n * (n - 1), 1)
    if weight_edge_lengths is None:
        weight_edge_lengths = density / 10.0
    if weight_edge_crossings is None:
        weight_edge_crossings = 1.0 - math.sqrt(density)
    rng = np.random.Generator(np.random.PCG64(seed))
    pos = rng.uniform(-1.0, 1.0, size=(n, 2))

    def seg_cross(p1, p2, p3, p4):
        d1 = p2 - p1
        d2 = p4 - p3
        den = -d2[0] * d1[1] + d1[0] * d2[1]
        if den == 0:
            return False
        s = (-d1[1] * (p1[0] - p3[0]) + d1[0] * (p1[1] - p3[1])) / den
        t = (d2[0] * (p1[1] - p3[1]) - d2[1] * (p1[0] - p3[0])) / den
        return 0 < s < 1 and 0 < t < 1

    def vertex_energy(v, p):
        en = 0.0
        if weight_node_dist:
            d2 = np.sum((pos - p) ** 2, axis=1)
            d2[v] = np.inf
            en += weight_node_dist * float(np.sum(1.0 / (d2 + 1e-12)))
        if weight_edge_lengths:
            for (a, b) in edges:
                if a == v or b == v:
                    other = pos[b] if a == v else pos[a]
                    en += weight_edge_lengths * float(
                        np.sum((p - other) ** 2))
        if weight_edge_crossings:
            vedges = [(a, b) for (a, b) in edges if a == v or b == v]
            for (a, b) in vedges:
                pa = p if a == v else pos[a]
                pb = p if b == v else pos[b]
                for (c, dd) in edges:
                    if c in (a, b) or dd in (a, b):
                        continue
                    if seg_cross(pa, pb, pos[c], pos[dd]):
                        en += weight_edge_crossings
        return en

    radius = 1.0
    for _ in range(maxiter):
        for _ in range(fineiter):
            v = int(rng.integers(0, n))
            old = pos[v].copy()
            cand = old + rng.uniform(-radius, radius, size=2)
            e_old = vertex_energy(v, old)
            e_new = vertex_energy(v, cand)
            if e_new <= e_old:
                pos[v] = cand
        radius *= cool_fact
    rows = [(vids[i], float(pos[i, 0]), float(pos[i, 1]))
            for i in range(n)]
    return spark.createDataFrame(rows, f"{ID} long, x double, y double")
