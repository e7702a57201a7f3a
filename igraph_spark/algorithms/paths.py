"""Path / distance algorithms (SURVEY.md §2.12 "Paths").

Reference entry points: BFS shortest paths
(/root/reference/src/structural_properties.c:455), Dijkstra
(:4245), Bellman-Ford (:5229), diameter (:91), average path length
(:223).

Spark shapes:
  * unweighted: BSP frontier expansion — one join + anti-join per hop,
    frontier rows are (source, vertex) pairs so multi-source BFS costs
    one pass (igraph loops sources sequentially);
  * weighted: Bellman-Ford relaxation rounds (join + min-agg) — the
    distributed SSSP workhorse (Dijkstra's priority queue is inherently
    sequential, the relaxation fixpoint is the same answer for
    non-negative weights and also handles negative edges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from igraph_spark.graph import Graph, SRC, DST, WEIGHT, ID


def _trav(graph: Graph, mode: str, weighted: bool) -> DataFrame:
    e = graph.weighted_edges() if weighted else \
        graph.edges.select(SRC, DST).withColumn(WEIGHT, F.lit(1.0))
    if not graph.directed or mode == "all":
        rev = e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST), WEIGHT)
        return e.unionByName(rev)
    if mode == "in":
        return e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST), WEIGHT)
    return e


def bfs_distances(graph: Graph, sources, mode: str = "out",
                  max_hops: int = 10000) -> DataFrame:
    """Multi-source unweighted hop distances ->
    DataFrame(source, id, dist).  Unreachable pairs are absent
    (igraph reports inf).  ``sources``: iterable of ids or DataFrame."""
    spark = graph.edges.sparkSession
    e = (_trav(graph, mode, weighted=False).select(SRC, DST)
         .where(F.col(SRC) != F.col(DST)).distinct()
         .persist(StorageLevel.MEMORY_AND_DISK))
    if isinstance(sources, DataFrame):
        src_df = sources.select(F.col(sources.columns[0]).alias("source"))
    else:
        src_df = spark.createDataFrame([(int(s),) for s in sources],
                                       "source long")
    visited = src_df.select("source", F.col("source").alias(ID),
                            F.lit(0).cast("long").alias("dist")).persist()
    frontier = visited
    for hop in range(1, max_hops + 1):
        nxt = (frontier.join(e, frontier[ID] == e[SRC])
               .select("source", F.col(DST).alias(ID))
               .distinct()
               .join(visited.select("source", ID), ["source", ID],
                     "left_anti")
               .withColumn("dist", F.lit(hop).cast("long"))
               .persist())
        if nxt.count() == 0:
            nxt.unpersist()
            break
        new_visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        # rotate: superseded frames are dropped eagerly — repeated BFS
        # calls (iFUB fringes, pivot closeness) must not accumulate
        # persisted state in the executor heap
        visited.unpersist()
        if frontier is not visited:
            frontier.unpersist()
        visited = new_visited
        frontier = nxt
    e.unpersist()
    return visited


def shortest_paths(graph: Graph, sources, mode: str = "out",
                   weights: bool | None = None,
                   max_rounds: int = 10000) -> DataFrame:
    """Weighted shortest-path distances via Bellman-Ford relaxation ->
    DataFrame(source, id, dist).  Falls back to hop BFS when
    unweighted.  Matches igraph_shortest_paths_bellman_ford semantics
    for reachable pairs."""
    use_w = graph.has_weights if weights is None else bool(weights)
    if not use_w:
        return bfs_distances(graph, sources, mode)
    spark = graph.edges.sparkSession
    e = _trav(graph, mode, weighted=True) \
        .persist(StorageLevel.MEMORY_AND_DISK)
    if isinstance(sources, DataFrame):
        src_df = sources.select(F.col(sources.columns[0]).alias("source"))
    else:
        src_df = spark.createDataFrame([(int(s),) for s in sources],
                                       "source long")
    state = src_df.select("source", F.col("source").alias(ID),
                          F.lit(0.0).alias("dist")).persist()
    for rnd in range(max_rounds):
        relaxed = (state.join(e, state[ID] == e[SRC])
                   .select("source", F.col(DST).alias(ID),
                           (F.col("dist") + F.col(WEIGHT)).alias("cand")))
        both = (state.select("source", ID, F.col("dist").alias("cand"))
                .unionByName(relaxed))
        new = (both.groupBy("source", ID)
               .agg(F.min("cand").alias("dist"))
               .localCheckpoint(eager=False))
        # converged when no (source, id) pair improved or appeared; the
        # count is the round's one action and it materializes the lazy
        # checkpoint in the same pass (per-round truncation: a periodic
        # cadence left un-lookupable cache entries between checkpoints
        # and silently recomputed the chain — see checkpointing.py)
        changed = (new.join(state.withColumnRenamed("dist", "old"),
                            ["source", ID], "left")
                   .where(F.col("old").isNull()
                          | (F.col("dist") < F.col("old")))
                   .count())
        state = new
        if changed == 0:
            break
    e.unpersist()
    return state


def delta_stepping(graph: Graph, sources, delta: float | None = None,
                   mode: str = "out", weights: bool | None = None,
                   max_rounds: int = 10000,
                   stats: dict | None = None) -> DataFrame:
    """Delta-stepping SSSP (Meyer-Sanders; reference shortest-path
    entry igraph_shortest_paths_dijkstra,
    structural_properties.c:4245) -> DataFrame(source, id, dist).

    Same answers as ``shortest_paths`` (Bellman-Ford) on non-negative
    weights, but each relaxation wave touches only the ACTIVE frontier
    x light edges instead of the full state x all edges: buckets of
    width ``delta`` (default: mean edge weight) are settled in order —
    light edges (w <= delta) iterate to a fixpoint inside the bucket,
    heavy edges relax once per bucket.  At 100x scale this is the
    weighted-SSSP workhorse; Bellman-Ford stays as the negative-weight
    fallback and the oracle-replayable form.

    ``stats`` (optional dict) receives {'rounds', 'frontier_rows'} for
    work accounting.
    """
    use_w = graph.has_weights if weights is None else bool(weights)
    if not use_w:
        return bfs_distances(graph, sources, mode)
    spark = graph.edges.sparkSession
    e = _trav(graph, mode, weighted=True).persist(StorageLevel.MEMORY_AND_DISK)
    if delta is None:
        row = e.agg(F.avg(WEIGHT)).first()
        delta = float(row[0]) if row and row[0] else 1.0
        delta = max(delta, 1e-12)
    neg = e.where(F.col(WEIGHT) < 0).isEmpty()
    if not neg:
        e.unpersist()
        raise ValueError("delta_stepping requires non-negative weights; "
                         "use shortest_paths (Bellman-Ford)")
    light = e.where(F.col(WEIGHT) <= delta).persist(StorageLevel.MEMORY_AND_DISK)
    heavy = e.where(F.col(WEIGHT) > delta).persist(StorageLevel.MEMORY_AND_DISK)

    if isinstance(sources, DataFrame):
        src_df = sources.select(F.col(sources.columns[0]).alias("source"))
    else:
        src_df = spark.createDataFrame([(int(s),) for s in sources],
                                       "source long")
    dist = src_df.select("source", F.col("source").alias(ID),
                         F.lit(0.0).alias("dist")).localCheckpoint(eager=True)
    bucket = F.floor(F.col("dist") / F.lit(delta))
    rounds, frontier_rows = 0, 0

    def _merge(cand):
        """min-merge candidates into dist -> (new_dist, improved)."""
        cmin = cand.groupBy("source", ID).agg(F.min("cand").alias("c"))
        j = dist.join(cmin, ["source", ID], "full")
        # least() skips nulls, so it covers all three cases (old only,
        # cand only, both); imp marks new-or-improved rows
        new = (j.select("source", ID,
                        F.least(F.col("dist"), F.col("c")).alias("dist"),
                        ((F.col("dist").isNull())
                         | (F.col("c") < F.col("dist"))).alias("imp"))
               .localCheckpoint(eager=True))
        return (new.select("source", ID, "dist"),
                new.where("imp").select("source", ID, "dist"))

    b = 0
    for _ in range(max_rounds):
        nxt_row = (dist.where(bucket >= b).agg(F.min(bucket)).first())
        if nxt_row[0] is None:
            break
        b = int(nxt_row[0])
        active = dist.where(bucket == b).persist()
        # light-edge fixpoint inside bucket b
        for _inner in range(max_rounds):
            n_act = active.count()
            if n_act == 0:
                active.unpersist()
                break
            rounds += 1
            frontier_rows += n_act
            cand = (active.join(light, active[ID] == light[SRC])
                    .select("source", F.col(DST).alias(ID),
                            (F.col("dist") + F.col(WEIGHT)).alias("cand")))
            dist, improved = _merge(cand)
            active.unpersist()
            active = improved.where(bucket == b).persist()
        # heavy edges once from the settled bucket
        settled = dist.where(bucket == b)
        if not heavy.isEmpty():
            rounds += 1
            cand = (settled.join(heavy, settled[ID] == heavy[SRC])
                    .select("source", F.col(DST).alias(ID),
                            (F.col("dist") + F.col(WEIGHT)).alias("cand")))
            dist, _ = _merge(cand)
        b += 1
    e.unpersist()
    light.unpersist()
    heavy.unpersist()
    if stats is not None:
        stats["rounds"] = rounds
        stats["frontier_rows"] = frontier_rows
    return dist


def _bfs_parents(graph: Graph, sources, mode: str = "out",
                 max_hops: int = 10000) -> DataFrame:
    """Multi-source BFS with deterministic min-id parent pointers ->
    DataFrame(source, id, dist, parent) (parent null at the source)."""
    spark = graph.edges.sparkSession
    e = (_trav(graph, mode, weighted=False).select(SRC, DST)
         .where(F.col(SRC) != F.col(DST)).distinct()
         .persist(StorageLevel.MEMORY_AND_DISK))
    if isinstance(sources, DataFrame):
        src_df = sources.select(F.col(sources.columns[0]).alias("source"))
    else:
        src_df = spark.createDataFrame([(int(s),) for s in sources],
                                       "source long")
    visited = src_df.select(
        "source", F.col("source").alias(ID),
        F.lit(0).cast("long").alias("dist"),
        F.lit(None).cast("long").alias("parent")).localCheckpoint(eager=True)
    frontier = visited.select("source", ID)
    for hop in range(1, max_hops + 1):
        nxt = (frontier.join(e, frontier[ID] == e[SRC])
               .select("source", F.col(DST).alias(ID),
                       F.col(SRC).alias("cand"))
               .join(visited.select("source", ID), ["source", ID],
                     "left_anti")
               .groupBy("source", ID).agg(F.min("cand").alias("parent"))
               .withColumn("dist", F.lit(hop).cast("long"))
               .select("source", ID, "dist", "parent")
               .localCheckpoint(eager=True))
        if nxt.count() == 0:
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("source", ID)
    e.unpersist()
    return visited


def girth(graph: Graph) -> int | None:
    """igraph_girth (/root/reference/src/structural_properties.c:3762):
    length of the shortest cycle, None for forests.

    Loops are 1-cycles and parallel edges 2-cycles (the reference's
    convention).  Otherwise the Itai-Rodeh BFS bound made exact: from
    every source, for every NON-TREE edge (u, w),
    d(u) + d(w) + 1 upper-bounds some contained cycle and the minimum
    over all sources attains the girth (from any vertex ON a shortest
    cycle the opposite edge realizes it; tree edges — parent(w) = u or
    parent(u) = w — are excluded, and the min-parent rule guarantees an
    even cycle's second opposite edge stays non-tree).  All sources run
    in one BSP sweep; O(V*E) candidate rows — test/moderate scale like
    the reference's per-vertex loop.
    """
    e_all = graph.edges.select(SRC, DST)
    if not e_all.where(F.col(SRC) == F.col(DST)).isEmpty():
        return 1
    canon = e_all.select(F.least(SRC, DST).alias("u"),
                         F.greatest(SRC, DST).alias("v"))
    if not canon.groupBy("u", "v").count().where("count > 1").isEmpty():
        return 2
    simple = canon.distinct()
    vis = _bfs_parents(graph, graph.vertices.select(ID), mode="all")
    du = vis.select(F.col("source").alias("s"), F.col(ID).alias("u"),
                    F.col("dist").alias("du"), F.col("parent").alias("pu"))
    dw = vis.select(F.col("source").alias("s"), F.col(ID).alias("v"),
                    F.col("dist").alias("dv"), F.col("parent").alias("pv"))
    cand = (simple.join(du, "u").join(dw, ["s", "v"])
            .where(~(F.col("pu").eqNullSafe(F.col("v"))
                     | F.col("pv").eqNullSafe(F.col("u"))))
            .agg(F.min(F.col("du") + F.col("dv") + 1).alias("g"))
            .first())
    return int(cand.g) if cand.g is not None else None


def get_shortest_paths(graph: Graph, sources, mode: str = "out",
                       max_hops: int = 10000) -> DataFrame:
    """igraph_get_shortest_paths analog
    (/root/reference/src/structural_properties.c:645) ->
    DataFrame(source, id, dist, path: array<long>) with one shortest
    path witness per reachable (source, id) pair.

    The witness is deterministic at any parallelism: each vertex's BFS
    parent is its minimum-id predecessor one level closer to the
    source, so the returned path is the minimum-parent chain (igraph
    returns an arbitrary shortest path; we pin the choice so results
    are reproducible and oracle-checkable).  Path reconstruction is an
    iterative prepend join — O(dist) rounds over (source, vertex) rows.
    """
    visited = _bfs_parents(graph, sources, mode, max_hops)

    parents = visited.select(F.col("source").alias("psrc"),
                             F.col(ID).alias("pid"),
                             F.col("parent").alias("pp"))
    done = visited.where(F.col("dist") == 0).select(
        "source", ID, "dist", F.array(F.col(ID)).alias("path"))
    todo = (visited.where(F.col("dist") > 0)
            .select("source", ID, "dist", F.col("parent").alias("head"),
                    F.array(F.col(ID)).alias("path")))
    for _ in range(max_hops):
        if todo.isEmpty():
            break
        todo = (todo.withColumn("path", F.concat(F.array(F.col("head")),
                                                 F.col("path")))
                .localCheckpoint(eager=True))
        finished = todo.where(F.col("head") == F.col("source"))
        done = done.unionByName(
            finished.select("source", ID, "dist", "path"))
        todo = (todo.where(F.col("head") != F.col("source"))
                .join(parents, (F.col("source") == F.col("psrc"))
                      & (F.col("head") == F.col("pid")))
                .select("source", ID, "dist", F.col("pp").alias("head"),
                        "path")
                .localCheckpoint(eager=True))
    return done


def get_all_shortest_paths(graph: Graph, sources, mode: str = "out",
                           max_hops: int = 10000) -> DataFrame:
    """igraph_get_all_shortest_paths analog
    (/root/reference/src/structural_properties.c:870) ->
    DataFrame(source, id, dist, path: array<long>) with ONE ROW PER
    DISTINCT shortest path (not just a witness).

    BFS keeps EVERY predecessor on some shortest path (the layered
    shortest-path DAG); reconstruction is the same iterative prepend
    join as ``get_shortest_paths`` but WITHOUT the min-parent
    reduction, so a row multiplies by its head's parent count each
    round.  Output size equals the shortest-path count — exponential
    in the worst case (the reference has the same blowup; it is an
    output-bound enumeration).
    """
    spark = graph.edges.sparkSession
    e = (_trav(graph, mode, weighted=False).select(SRC, DST)
         .where(F.col(SRC) != F.col(DST)).distinct()
         .persist(StorageLevel.MEMORY_AND_DISK))
    if isinstance(sources, DataFrame):
        src_df = sources.select(F.col(sources.columns[0]).alias("source"))
    else:
        src_df = spark.createDataFrame([(int(s),) for s in sources],
                                       "source long")
    visited = src_df.select("source", F.col("source").alias(ID),
                            F.lit(0).cast("long").alias("dist")) \
        .localCheckpoint(eager=True)
    frontier = visited.select("source", ID)
    par_parts = []
    for hop in range(1, max_hops + 1):
        reached = (frontier.join(e, frontier[ID] == e[SRC])
                   .select("source", F.col(DST).alias(ID),
                           F.col(SRC).alias("parent"))
                   .join(visited.select("source", ID), ["source", ID],
                         "left_anti")
                   .localCheckpoint(eager=True))
        nxt = reached.select("source", ID).distinct() \
            .withColumn("dist", F.lit(hop).cast("long")) \
            .localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        par_parts.append(reached)
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("source", ID)
    e.unpersist()
    if not par_parts:
        return visited.select("source", ID, "dist",
                              F.array(F.col(ID)).alias("path"))
    par_all = par_parts[0]
    for p in par_parts[1:]:
        par_all = par_all.unionByName(p)
    par_all = par_all.select(F.col("source").alias("psrc"),
                             F.col(ID).alias("pid"),
                             F.col("parent").alias("pp")) \
        .persist(StorageLevel.MEMORY_AND_DISK)

    done = visited.where(F.col("dist") == 0).select(
        "source", ID, "dist", F.array(F.col(ID)).alias("path"))
    todo = (visited.where(F.col("dist") > 0)
            .select("source", ID, "dist", F.col(ID).alias("head"),
                    F.array(F.col(ID)).alias("path")))
    for _ in range(max_hops):
        if todo.isEmpty():
            break
        # expand: every parent of the current head forks the path
        todo = (todo.join(par_all, (F.col("source") == F.col("psrc"))
                          & (F.col("head") == F.col("pid")))
                .select("source", ID, "dist", F.col("pp").alias("head"),
                        F.concat(F.array(F.col("pp")), F.col("path"))
                        .alias("path"))
                .localCheckpoint(eager=True))
        finished = todo.where(F.col("head") == F.col("source"))
        done = done.unionByName(
            finished.select("source", ID, "dist", "path"))
        todo = todo.where(F.col("head") != F.col("source"))
    par_all.unpersist()
    return done


def get_all_simple_paths(graph: Graph, source: int, to=None,
                         mode: str = "out",
                         cutoff: int | None = None) -> DataFrame:
    """igraph_get_all_simple_paths analog
    (/root/reference/src/paths.c:60) -> DataFrame(id, path:
    array<long>) with one row per simple path from ``source`` to
    vertex ``id`` (vertex-distinct walks; the single-vertex path to
    the source itself is excluded, matching the reference's stack
    semantics of emitting only on reaching a ``to`` vertex).

    ``to``: iterable of target ids, or None for all vertices.
    ``cutoff``: maximum path LENGTH in edges (the reference
    enumerates unbounded — pass None for parity; at scale always set
    a cutoff: simple-path counts grow exponentially, and this is an
    output-bound enumeration exactly like the reference's DFS).

    BSP shape: the frontier is (terminal, path) rows; each superstep
    is one join frontier->edges with an ``array_contains`` revisit
    filter, so every superstep's work is proportional to the number
    of live partial paths — distributed over their terminal vertex.
    """
    spark = graph.edges.sparkSession
    e = (_trav(graph, mode, weighted=False).select(SRC, DST)
         .where(F.col(SRC) != F.col(DST)).distinct()
         .persist(StorageLevel.MEMORY_AND_DISK))
    targets = None if to is None else {int(t) for t in to}
    max_len = cutoff if cutoff is not None else 1 << 30

    frontier = spark.createDataFrame(
        [(int(source),)], "term long").select(
        "term", F.array(F.col("term")).alias("path"))
    out_parts = []
    step = 0
    while step < max_len:
        step += 1
        frontier = (frontier.join(e, frontier["term"] == e[SRC])
                    .where(~F.array_contains(F.col("path"), F.col(DST)))
                    .select(F.col(DST).alias("term"),
                            F.concat("path", F.array(F.col(DST)))
                            .alias("path"))
                    .localCheckpoint(eager=True))
        if frontier.isEmpty():
            break
        hits = frontier if targets is None else \
            frontier.where(F.col("term").isin(list(targets)))
        out_parts.append(hits.select(F.col("term").alias(ID), "path"))
    e.unpersist()
    if not out_parts:
        return spark.createDataFrame([], "id long, path array<bigint>")
    out = out_parts[0]
    for p in out_parts[1:]:
        out = out.unionByName(p)
    return out


def average_path_length(graph: Graph) -> float:
    """igraph_average_path_length (structural_properties.c:223):
    mean finite shortest-path length over ordered reachable pairs,
    excluding self-pairs."""
    from igraph_spark.operators.structure import path_length_hist
    hist = path_length_hist(graph).agg(
        F.sum(F.col("dist") * F.col("count")).alias("s"),
        F.sum("count").alias("n")).first()
    if not hist.n:
        return float("nan")
    return float(hist.s) / float(hist.n)


def diameter(graph: Graph, method: str = "auto",
             auto_threshold: int = 16384) -> int:
    """igraph_diameter (structural_properties.c:91): longest finite
    shortest path (unweighted).

    ``method``:
      * 'exact'  — all-pairs multi-source BFS histogram (O(V*E) state;
        the reference's own complexity).  Covers every component.
      * 'ifub'   — iFUB bound-pruning (Crescenzi et al.): BFS levels
        from a max-degree root, then batch-eccentricity of fringes from
        the deepest level down, stopping when the 2*(level-1) upper
        bound meets the best lower bound.  Each step is one multi-
        source BSP pass; typically a handful of BFS instead of V.
        Undirected graphs only; covers the root's (giant) component —
        exact there, documented as the at-scale mode.
      * 'auto'   — 'exact' below ``auto_threshold`` vertices or when
        directed, else 'ifub'.
    """
    if method == "auto":
        method = ("ifub" if (not graph.directed
                             and graph.vcount() > auto_threshold)
                  else "exact")
    if method == "ifub":
        if graph.directed:
            raise ValueError("ifub diameter requires an undirected graph")
        return _diameter_ifub(graph)
    from igraph_spark.operators.structure import path_length_hist
    row = path_length_hist(graph).agg(F.max("dist")).first()
    return int(row[0]) if row[0] is not None else 0


def _diameter_ifub(graph: Graph) -> int:
    """iFUB: lb from a 2-sweep, then process BFS fringes top-down until
    ub = 2*(i-1) <= lb.  Every distance evaluation is a batched
    multi-source BFS (one BSP pass per fringe)."""
    # root = max-degree vertex (the standard iFUB seed)
    root_row = (graph.degree("all")
                .orderBy(F.col("degree").desc(), F.col(ID))
                .select(ID).first())
    if root_row is None:
        return 0
    root = int(root_row[0])
    d_root = bfs_distances(graph, [root], "all").persist()
    # 2-sweep: farthest vertex from root starts the lower bound
    far = (d_root.orderBy(F.col("dist").desc(), F.col(ID))
           .select(ID, "dist").first())
    depth = int(far["dist"])
    if depth == 0:
        d_root.unpersist()
        return 0
    a = int(far[ID])
    d_a = bfs_distances(graph, [a], "all")
    lb = int(d_a.agg(F.max("dist")).first()[0])
    d_a.unpersist()
    # fringe loop over the root's BFS levels, deepest first
    i = depth
    while i > 0 and 2 * (i - 1) > lb:
        fringe = d_root.where(F.col("dist") == i).select(ID)
        d_f = bfs_distances(graph, fringe, "all")
        ecc_max = d_f.agg(F.max("dist")).first()[0]
        d_f.unpersist()
        if ecc_max is not None:
            lb = max(lb, int(ecc_max))
        i -= 1
    d_root.unpersist()
    return lb


def eccentricity(graph: Graph, mode: str = "all") -> DataFrame:
    """Per-vertex eccentricity (max finite distance) ->
    DataFrame(id, ecc).  All-sources BFS — O(V*E), test/moderate scale
    like the reference's per-vertex loop."""
    all_src = graph.vertices.select(ID)
    d = bfs_distances(graph, all_src, mode)
    return (d.groupBy("source").agg(F.max("dist").alias("ecc"))
            .withColumnRenamed("source", ID))


def closeness(graph: Graph, mode: str = "out",
              auto_sample_threshold: int | None = None,
              sample_size: int = 256, seed: int = 42,
              weights: bool | str | None = None) -> DataFrame:
    """Closeness centrality (igraph_closeness, centrality.c:2473):
    (n_reached - 1) normalized by the sum of distances to reached
    vertices -> DataFrame(id, closeness).  igraph 0.7 divides by
    (reached_sum) over (n-1 possible): we follow the classic
    sum-of-distances form restricted to reachable pairs.

    Scale guardrail: above ``auto_sample_threshold`` vertices
    (default: betweenness.AUTO_SAMPLE_VCOUNT) the exact all-sources
    BFS (O(V^2) state) is replaced by the Eppstein-Wang pivot
    estimator — ``sample_size`` uniform pivot targets, BFS run FROM
    the pivots in the inverse direction (one multi-source pass,
    O(sample_size * V) state), closeness(v) = the same reached/total
    ratio restricted to the pivot set.  Exact on distance-regular
    targets (e.g. complete graphs); ratio-consistent in general.

    ``weights``: True or a column name dispatches to the weighted
    analog (weighted_centrality.closeness_weighted, Dijkstra-based
    per the reference), same pivot guardrail."""
    if weights:
        from igraph_spark.algorithms.weighted_centrality import (
            closeness_weighted)
        return closeness_weighted(
            graph, mode=mode,
            weight_col=weights if isinstance(weights, str) else "weight",
            auto_sample_threshold=auto_sample_threshold,
            sample_size=sample_size, seed=seed)
    from igraph_spark.algorithms.betweenness import (
        AUTO_SAMPLE_VCOUNT, sample_sources)
    if auto_sample_threshold is None:
        auto_sample_threshold = AUTO_SAMPLE_VCOUNT
    if graph.vcount() > auto_sample_threshold:
        pivots = sample_sources(graph, sample_size, seed)
        inv = {"out": "in", "in": "out", "all": "all"}[mode]
        d = bfs_distances(graph, pivots, inv)
        agg = (d.where(F.col("dist") > 0)
               .groupBy(ID)
               .agg(F.sum("dist").alias("total"),
                    F.count("*").alias("reached")))
        return agg.select(ID, (F.col("reached") / F.col("total"))
                          .alias("closeness"))
    all_src = graph.vertices.select(ID)
    d = bfs_distances(graph, all_src, mode)
    agg = (d.where(F.col("dist") > 0)
           .groupBy("source")
           .agg(F.sum("dist").alias("total"), F.count("*").alias("reached")))
    return agg.select(F.col("source").alias(ID),
                      (F.col("reached") / F.col("total")).alias("closeness"))


def random_walks(graph: Graph, num_walks_per_vertex: int = 1,
                 length: int = 10, seed: int = 42,
                 weights: bool | None = None,
                 rng: str = "xxhash") -> DataFrame:
    """Deterministic pseudo-random walks (DeepWalk-style corpus
    generation; reference analog /root/reference/src/random_walk.c) ->
    DataFrame(walk_id, step, id).

    Two equivalent uniform step rules, both hash-driven so the walk
    corpus is reproducible at any parallelism:

      * rng='xxhash' (default): pick the k-th out-neighbor with
        k = xxhash64(walk_id, step, seed) mod outdeg.
      * rng='md5': pick the out-neighbor minimizing the md5 hex string
        of '{walk_id}:{step}:{seed}:{dst}' — each neighbor is equally
        likely to hold the minimum, and md5 exists verbatim in ANSI-SQL
        engines, so a DuckDB oracle can replay the walks exactly.

    Walks that reach a sink stop early.  One join per step over all
    walks simultaneously.
    """
    from pyspark.sql import Window
    spark = graph.edges.sparkSession
    e = graph.edges.select(SRC, DST)
    w = Window.partitionBy(SRC).orderBy(DST)
    adj = (e.distinct()
           .withColumn("k", F.row_number().over(w) - 1))
    degs = adj.groupBy(SRC).agg(F.max("k").alias("maxk"))
    adj = adj.join(degs, SRC).persist(StorageLevel.MEMORY_AND_DISK)

    verts = graph.vertices.select(ID)
    walks0 = (verts.crossJoin(
        spark.range(num_walks_per_vertex).toDF("w"))
        .select((F.col(ID) * num_walks_per_vertex + F.col("w"))
                .alias("walk_id"),
                F.lit(0).cast("long").alias("step"),
                F.col(ID)))
    parts = [walks0]
    cur = walks0.persist()
    for step in range(1, length):
        if rng == "md5":
            h = F.md5(F.concat_ws(
                ":", F.col("walk_id"), F.lit(step), F.lit(seed), F.col(DST)))
            pick_win = Window.partitionBy("walk_id").orderBy(h.asc(),
                                                             F.col(DST).asc())
            nxt = (cur.join(adj, cur[ID] == adj[SRC])
                   .withColumn("rn", F.row_number().over(pick_win))
                   .where("rn = 1")
                   .select("walk_id", F.lit(step).cast("long").alias("step"),
                           F.col(DST).alias(ID))
                   .persist())
        else:
            pick = F.pmod(F.xxhash64("walk_id", F.lit(step), F.lit(seed)),
                          F.col("maxk") + 1)
            nxt = (cur.join(adj, cur[ID] == adj[SRC])
                   .where(F.col("k") == pick)
                   .select("walk_id", F.lit(step).cast("long").alias("step"),
                           F.col(DST).alias(ID))
                   .persist())
        if nxt.count() == 0:
            break
        parts.append(nxt)
        cur.unpersist()
        cur = nxt
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
