"""Bipartite operators — igraph_is_bipartite and
igraph_bipartite_projection (/root/reference/src/bipartite.c).

is_bipartite: BFS 2-coloring per component (color = BFS level parity,
min-id roots) + a conflict scan over edges — one BSP sweep, one join.
projection: the classic co-membership join; the multiplicity column
matches the reference's projection edge weights (number of shared
opposite-side neighbors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from igraph_spark.graph import Graph, SRC, DST, ID


def is_bipartite(graph: Graph) -> tuple[bool, DataFrame]:
    """-> (bipartite?, types DataFrame(id, type)) where type is the
    2-coloring when bipartite (BFS level parity from per-component
    min-id roots; igraph's igraph_is_bipartite returns the same kind
    of certificate)."""
    from igraph_spark.algorithms.biconnected import _bfs_forest
    _, dist = _bfs_forest(graph)
    types = dist.select(ID, F.pmod(F.col("dist"), F.lit(2)).alias("type"))
    sym = graph.sym_edges().where(F.col(SRC) != F.col(DST)).distinct()
    conflicts = (sym
                 .join(types.select(F.col(ID).alias(SRC),
                                    F.col("type").alias("ta")), SRC)
                 .join(types.select(F.col(ID).alias(DST),
                                    F.col("type").alias("tb")), DST)
                 .where(F.col("ta") == F.col("tb")))
    ok = conflicts.isEmpty()
    loops = not graph.edges.where(F.col(SRC) == F.col(DST)).isEmpty()
    return (ok and not loops), types


def bipartite_projection(graph: Graph, types: DataFrame,
                         which: int = 0) -> Graph:
    """igraph_bipartite_projection (bipartite.c): project onto the
    ``which``-typed side; projected edge (a, b) iff a and b share an
    opposite-side neighbor, weight = number of shared neighbors."""
    t = types.select(F.col(types.columns[0]).alias(ID),
                     F.col(types.columns[1]).alias("type"))
    sym = graph.sym_edges().where(F.col(SRC) != F.col(DST)).distinct()
    # incidences from the chosen side into the other side
    inc = (sym.join(t.select(F.col(ID).alias(SRC),
                             F.col("type").alias("ts")), SRC)
           .where(F.col("ts") == which)
           .select(F.col(SRC).alias("m"), F.col(DST).alias("o")))
    pairs = (inc.alias("x").join(inc.alias("y"),
                                 (F.col("x.o") == F.col("y.o"))
                                 & (F.col("x.m") < F.col("y.m")))
             .groupBy(F.col("x.m").alias(SRC), F.col("y.m").alias(DST))
             .agg(F.count("*").cast("double").alias("weight")))
    verts = t.where(F.col("type") == which).select(ID)
    return Graph(pairs, verts, directed=False, _canonical=True)


def maximum_bipartite_matching(graph: Graph, types: DataFrame) -> dict:
    """igraph_maximum_bipartite_matching
    (/root/reference/src/matching.c) -> {"matching_size",
    "matching": DataFrame(a, b)}.

    Reduction to unit-capacity maxflow (Koenig): super-source -> every
    type-0 vertex, type-0 -> type-1 along the graph's edges, type-1 ->
    super-sink, all caps 1; the integral maxflow's middle arcs are a
    maximum matching.  Reuses the distributed Edmonds-Karp kernel
    (algorithms/flow.py), whose augmenting BFS is the same keyed
    frontier join as every other BSP loop here.  ``types``:
    DataFrame(id, type) with type in {0, 1}.
    """
    from igraph_spark.algorithms.flow import maxflow

    spark = graph.edges.sparkSession
    t0 = types.where(F.col("type") == 0).select(ID)
    t1 = types.where(F.col("type") == 1).select(ID)
    n = graph.vcount()
    s_id, t_id = -1, -2
    sym = graph.edges.select(SRC, DST).unionByName(
        graph.edges.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))) \
        if not graph.directed else graph.edges.select(SRC, DST)
    mid = (sym.join(t0.withColumnRenamed(ID, SRC), SRC, "left_semi")
           .join(t1.withColumnRenamed(ID, DST), DST, "left_semi")
           .select(SRC, DST).distinct())
    arcs = (t0.select(F.lit(s_id).cast("long").alias(SRC),
                      F.col(ID).alias(DST))
            .unionByName(mid)
            .unionByName(t1.select(F.col(ID).alias(SRC),
                                   F.lit(t_id).cast("long").alias(DST)))
            .withColumn("weight", F.lit(1.0)))
    verts = (graph.vertices.select(ID)
             .unionByName(spark.createDataFrame([(s_id,), (t_id,)],
                                                "id long")))
    flow_g = Graph(arcs, verts, directed=True)
    r = maxflow(flow_g, s_id, t_id, weights=True,
                max_augmentations=n + 2)
    matching = (r["flow"].where((F.col(SRC) >= 0) & (F.col(DST) >= 0)
                                & (F.col("f") > 0.5))
                .select(F.col(SRC).alias("a"), F.col(DST).alias("b")))
    return {"matching_size": int(round(r["value"])), "matching": matching}
