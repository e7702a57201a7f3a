"""Betweenness centrality — distributed Brandes (unweighted).

Reference: igraph_betweenness
(/root/reference/src/centrality.c:1569-2272), single-node Brandes 2001:
per source, a BFS computes shortest-path counts (sigma), then a
reverse sweep accumulates pair dependencies (delta).

Spark shape: ALL sources run simultaneously — the state is
(source, vertex) pairs, so each BFS level is one join + aggregation
over every source at once, and the reverse sweep walks the shared
level structure back down.  Work is O(V*E) rows like the reference's
O(VE) time; levels are localCheckpointed so the sweep reads
materialized layers.  Intended for the same scale the reference runs
exact betweenness at (its own docs recommend sampling/estimates above
that — igraph_betweenness_estimate; a sources= subset here gives the
same estimator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from igraph_spark.graph import Graph, SRC, DST, ID

#: above this vertex count, ``betweenness()``/``closeness()`` with no
#: explicit ``sources`` default to the sampled estimator instead of
#: exact all-sources O(V*E) state (igraph's own docs point large graphs
#: at igraph_betweenness_estimate; centrality.c:1569-2272)
AUTO_SAMPLE_VCOUNT = 16384
DEFAULT_SAMPLE_SIZE = 256


def sample_sources(graph: Graph, k: int, seed: int = 42) -> DataFrame:
    """Deterministic uniform k-subset of the vertex set: order by
    xxhash64(id, seed), keep the first k.  Used by the Brandes-Pich
    sampled betweenness estimator and the pivot closeness estimator."""
    return (graph.vertices.select(ID)
            .orderBy(F.xxhash64(F.col(ID), F.lit(seed)), F.col(ID))
            .limit(k))


def _traversal_edges(graph: Graph, use_directed: bool) -> DataFrame:
    e = graph.edges.select(SRC, DST)
    if not use_directed:
        e = e.unionByName(e.select(F.col(DST).alias(SRC),
                                   F.col(SRC).alias(DST)))
    return (e.where(F.col(SRC) != F.col(DST)).distinct()
            .persist(StorageLevel.MEMORY_AND_DISK))


def _source_df(graph: Graph, sources):
    spark = graph.edges.sparkSession
    if sources is None:
        return graph.vertices.select(F.col(ID).alias("s"))
    if isinstance(sources, DataFrame):
        return sources.select(F.col(sources.columns[0]).alias("s"))
    return spark.createDataFrame([(int(x),) for x in sources], "s long")


def _forward_layers(e: DataFrame, src_df: DataFrame,
                    max_depth: int) -> list[DataFrame]:
    """Brandes forward phase: BFS levels of (s, id, sigma) rows."""
    layer = (src_df.select("s", F.col("s").alias(ID),
                           F.lit(1.0).alias("sigma"))
             .localCheckpoint(eager=True))
    visited = layer
    layers = [layer]
    for _depth in range(1, max_depth + 1):
        nxt = (layer.join(e, layer[ID] == e[SRC])
               .select("s", F.col(DST).alias(ID), "sigma")
               .join(visited.select("s", ID), ["s", ID], "left_anti")
               .groupBy("s", ID).agg(F.sum("sigma").alias("sigma"))
               .localCheckpoint(eager=True))
        if nxt.count() == 0:
            break
        layers.append(nxt)
        visited = (visited.unionByName(nxt)
                   .localCheckpoint(eager=True))
        layer = nxt
    return layers


def edge_betweenness(graph: Graph, sources=None,
                     directed: bool | None = None,
                     max_depth: int = 10000) -> DataFrame:
    """igraph_edge_betweenness analog
    (/root/reference/src/centrality.c:2065-2272) ->
    DataFrame(src, dst, betweenness) over the simple edge set
    (canonical u <= v for undirected graphs).

    Same all-sources-at-once Brandes shape as ``betweenness``; the
    backward sweep accumulates the pair-dependency terms
    sigma_v / sigma_w * (1 + delta_w) PER TRAVERSAL EDGE before they
    are folded into vertex deltas.  Undirected scores halve the two
    orientations' sum, matching the reference.  Same simple-graph
    contract and sampled-``sources`` estimator as ``betweenness``.
    """
    use_directed = graph.directed if directed is None else directed
    e = _traversal_edges(graph, use_directed)
    layers = _forward_layers(e, _source_df(graph, sources), max_depth)

    eb_parts: list[DataFrame] = []
    delta = layers[-1].select("s", ID, F.lit(0.0).alias("delta"))
    for d in range(len(layers) - 2, -1, -1):
        below = (layers[d + 1]
                 .join(delta, ["s", ID], "left")
                 .select("s", F.col(ID).alias("w"),
                         F.col("sigma").alias("sigma_w"),
                         F.coalesce("delta", F.lit(0.0)).alias("delta_w")))
        terms = (layers[d].alias("v")
                 .join(e, F.col(f"v.{ID}") == e[SRC])
                 .join(below,
                       (F.col(DST) == below["w"])
                       & (F.col("v.s") == below["s"]))
                 .select(F.col("v.s").alias("s"),
                         F.col(f"v.{ID}").alias("ev"),
                         F.col("w").alias("ew"),
                         (F.col("v.sigma") / F.col("sigma_w")
                          * (F.lit(1.0) + F.col("delta_w"))).alias("t"))
                 .localCheckpoint(eager=True))
        eb_parts.append(terms.groupBy("ev", "ew")
                        .agg(F.sum("t").alias("ebd")))
        delta = (layers[d].select("s", ID)
                 .join(terms.groupBy("s", F.col("ev").alias(ID))
                       .agg(F.sum("t").alias("delta")), ["s", ID], "left")
                 .select("s", ID, F.coalesce("delta", F.lit(0.0))
                         .alias("delta"))
                 .localCheckpoint(eager=True))
    e.unpersist()
    if not eb_parts:
        return graph.edges.sparkSession.createDataFrame(
            [], "src long, dst long, betweenness double")
    allp = eb_parts[0]
    for p in eb_parts[1:]:
        allp = allp.unionByName(p)
    if use_directed:
        out = (allp.groupBy(F.col("ev").alias(SRC), F.col("ew").alias(DST))
               .agg(F.sum("ebd").alias("betweenness")))
    else:
        out = (allp.select(F.least("ev", "ew").alias(SRC),
                           F.greatest("ev", "ew").alias(DST), "ebd")
               .groupBy(SRC, DST)
               .agg((F.sum("ebd") / 2.0).alias("betweenness")))
    return out


def girvan_newman(graph: Graph, n_communities: int = 2,
                  max_removals: int | None = None) -> DataFrame:
    """igraph_community_edge_betweenness analog
    (/root/reference/src/community.c:373): repeatedly remove the
    highest-edge-betweenness edge (deterministic min-(src,dst)
    tie-break) until the graph splits into ``n_communities`` weak
    components -> DataFrame(id, label) with dense min-id component
    labels.

    Like the reference, this is O(removals * m * n) — a small-graph
    method by construction (igraph's own docs say so); the driver-side
    loop mirrors the reference's sequential dendrogram build.
    """
    from igraph_spark.algorithms.components import connected_components
    spark = graph.edges.sparkSession
    edges = (graph.edges.select(F.least(SRC, DST).alias(SRC),
                                F.greatest(SRC, DST).alias(DST))
             .where(F.col(SRC) != F.col(DST)).distinct())
    verts = graph.vertices.select(ID)
    cur = Graph(edges, verts, directed=False, _canonical=True)
    limit = max_removals if max_removals is not None else edges.count()
    for _ in range(int(limit)):
        comp = connected_components(cur, "weak")
        ncomp = comp.select("component").distinct().count()
        if ncomp >= n_communities:
            return comp.withColumnRenamed("component", "label")
        eb = edge_betweenness(cur, directed=False)
        top = (eb.orderBy(F.desc("betweenness"), F.asc(SRC), F.asc(DST))
               .limit(1).collect())
        if not top:
            break
        u, v = int(top[0][SRC]), int(top[0][DST])
        cur = Graph(cur.edges.where(~((F.col(SRC) == u)
                                      & (F.col(DST) == v)))
                    .localCheckpoint(eager=True),
                    verts, directed=False, _canonical=True)
    comp = connected_components(cur, "weak")
    return comp.withColumnRenamed("component", "label")


def betweenness(graph: Graph, sources=None, directed: bool | None = None,
                max_depth: int = 10000,
                auto_sample_threshold: int = AUTO_SAMPLE_VCOUNT,
                sample_size: int = DEFAULT_SAMPLE_SIZE,
                seed: int = 42,
                weights: bool | str | None = None) -> DataFrame:
    """-> DataFrame(id, betweenness).

    ``weights``: None/False = unweighted Brandes (below); True or a
    column name dispatches to the Dijkstra-Brandes analog
    (weighted_centrality.betweenness_weighted, ref
    centrality.c:1767-1900) with the same sampling guardrail.

    ``sources``: optional iterable/DataFrame of source ids — all
    vertices by default (exact); a subset gives the Brandes estimator
    (igraph_betweenness_estimate analog).  Undirected results halve
    the pair dependencies, matching the reference.

    Scale guardrail: with ``sources=None`` and vcount >
    ``auto_sample_threshold``, the Brandes-Pich sampled estimator runs
    instead of exact all-sources Brandes — ``sample_size`` uniform
    hash-chosen sources, dependencies extrapolated by n/k.  State is
    then O(sample_size * V) rows instead of O(V^2).  Standard error is
    O(n/sqrt(k) * diam); pass ``sources=graph.vertices`` to force the
    exact O(V*E) computation, or raise ``auto_sample_threshold``.
    On vertex-transitive graphs the extrapolated totals are exact.

    Simple-graph restriction: the traversal edge set is deduplicated,
    so parallel edges count as one geodesic each; igraph's Brandes
    counts each parallel edge as a distinct shortest path, so sigma
    diverges on multigraphs — run ``simplify`` first (the exactness
    contract here is for simple graphs, which is what the driver and
    fixtures exercise).  At 10^9-edge scale, exact all-sources Brandes
    is O(V*E) rows by construction — pass a sampled ``sources`` subset
    there (the estimator is the documented large-graph mode, like
    igraph_betweenness_estimate).
    """
    if weights:
        from igraph_spark.algorithms.weighted_centrality import (
            betweenness_weighted)
        return betweenness_weighted(
            graph, sources=sources, directed=directed,
            weight_col=weights if isinstance(weights, str) else "weight",
            auto_sample_threshold=auto_sample_threshold,
            sample_size=sample_size, seed=seed)
    use_directed = graph.directed if directed is None else directed
    scale_up = 1.0
    if sources is None:
        n = graph.vcount()
        if n > auto_sample_threshold:
            sources = sample_sources(graph, sample_size, seed)
            scale_up = n / float(sample_size)
    e = _traversal_edges(graph, use_directed)
    layers = _forward_layers(e, _source_df(graph, sources), max_depth)

    # ---- backward phase: delta accumulation, deepest layer first
    bc_parts: list[DataFrame] = []
    delta = layers[-1].select("s", ID, F.lit(0.0).alias("delta"))
    for d in range(len(layers) - 2, -1, -1):
        below = (layers[d + 1]
                 .join(delta, ["s", ID], "left")
                 .select("s", F.col(ID).alias("w"),
                         F.col("sigma").alias("sigma_w"),
                         F.coalesce("delta", F.lit(0.0)).alias("delta_w")))
        contrib = (layers[d].alias("v")
                   .join(e, F.col(f"v.{ID}") == e[SRC])
                   .join(below,
                         (F.col(DST) == below["w"])
                         & (F.col("v.s") == below["s"]))
                   .groupBy(F.col("v.s").alias("s"), F.col(f"v.{ID}").alias(ID))
                   .agg(F.sum(F.col("v.sigma") / F.col("sigma_w")
                              * (F.lit(1.0) + F.col("delta_w")))
                        .alias("delta")))
        delta = (layers[d].select("s", ID)
                 .join(contrib, ["s", ID], "left")
                 .select("s", ID, F.coalesce("delta", F.lit(0.0))
                         .alias("delta"))
                 .localCheckpoint(eager=True))
        # dependencies of non-source vertices accumulate into bc
        bc_parts.append(delta.where(F.col(ID) != F.col("s"))
                        .select(ID, "delta"))

    e.unpersist()
    if not bc_parts:
        return graph.vertices.select(ID, F.lit(0.0).alias("betweenness"))
    allp = bc_parts[0]
    for p in bc_parts[1:]:
        allp = allp.unionByName(p)
    scale = (0.5 if not use_directed else 1.0) * scale_up
    bc = (allp.groupBy(ID)
          .agg((F.sum("delta") * F.lit(scale)).alias("betweenness")))
    return (graph.vertices.select(ID)
            .join(bc, ID, "left")
            .select(ID, F.coalesce("betweenness", F.lit(0.0))
                    .alias("betweenness")))
