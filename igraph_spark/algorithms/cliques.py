"""Clique enumeration — igraph_cliques / igraph_maximal_cliques
(/root/reference/src/cliques.c:327, src/maximal_cliques.c:322; the
reference's own benchmark examples/benchmarks/igraph_maximal_cliques.c).

Spark shape: iterative expansion over the degree-oriented adjacency
(the same (deg, id) rank orientation as the triangle kernel, so every
clique is enumerated exactly once, at its minimum-rank member, and
fan-out is degeneracy-bounded).  Each round extends k-cliques to
(k+1)-cliques by exploding the clique's FORWARD candidate set (common
oriented neighbors of all members) and intersecting adjacency arrays —
one explode + one join per round, no per-row Python.  Maximality is
tracked with the full (undirected) common neighborhood: a clique is
maximal iff that set is empty.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from igraph_spark.graph import Graph, ID
from igraph_spark.algorithms.triangles import _oriented


def _clique_frontier(graph: Graph) -> tuple[DataFrame, DataFrame]:
    """-> (frontier of 1-cliques, oriented adjacency table).

    frontier columns: members array<long>, cands array<long> (common
    forward/oriented neighbors), ext array<long> (common neighbors in
    any direction — maximality witness set).
    """
    oriented, _ = _oriented(graph)
    adj_fwd = (oriented.groupBy(F.col("lo").alias(ID))
               .agg(F.sort_array(F.collect_list("hi")).alias("fwd")))
    nbrs = (oriented.select(F.col("lo").alias(ID), F.col("hi").alias("n"))
            .unionByName(oriented.select(F.col("hi").alias(ID),
                                         F.col("lo").alias("n"))))
    adj_all = (nbrs.groupBy(ID)
               .agg(F.sort_array(F.collect_list("n")).alias("all")))
    adj = (graph.vertices.select(ID)
           .join(adj_fwd, ID, "left").join(adj_all, ID, "left")
           .select(ID,
                   F.coalesce("fwd", F.array().cast("array<long>"))
                   .alias("fwd"),
                   F.coalesce("all", F.array().cast("array<long>"))
                   .alias("all"))
           .persist(StorageLevel.MEMORY_AND_DISK))
    frontier = adj.select(F.array(F.col(ID)).alias("members"),
                          F.col("fwd").alias("cands"),
                          F.col("all").alias("ext"))
    return frontier, adj


def maximal_cliques(graph: Graph, min_size: int = 1,
                    max_size: int | None = None,
                    max_rounds: int = 1000) -> DataFrame:
    """-> DataFrame(clique: array<long> sorted by id, size: long) of all
    maximal cliques with min_size <= size [<= max_size].

    Note igraph's convention: a maximal clique is one not contained in
    a larger clique — isolated vertices are maximal 1-cliques."""
    frontier, adj = _clique_frontier(graph)
    out_parts: list[DataFrame] = []
    size = 1
    while size <= (max_size or max_rounds):
        frontier = frontier.persist(StorageLevel.MEMORY_AND_DISK)
        if frontier.isEmpty():
            frontier.unpersist()
            break
        if size >= min_size:
            maximal = (frontier.where(F.size("ext") == 0)
                       .select(F.sort_array("members").alias("clique"),
                               F.lit(size).cast("long").alias("size")))
            out_parts.append(maximal.localCheckpoint(eager=True))
        nxt = (frontier.where(F.size("cands") > 0)
               .select("members", "cands", "ext",
                       F.explode("cands").alias("w")))
        # extend by w: forward candidates and maximality witnesses both
        # shrink to those also adjacent to w
        frontier_new = (nxt.join(adj.withColumnRenamed(ID, "w"), "w")
                        .select(F.concat("members", F.array("w"))
                                .alias("members"),
                                F.array_intersect("cands", "fwd")
                                .alias("cands"),
                                F.array_intersect("ext", "all")
                                .alias("ext")))
        frontier.unpersist()
        frontier = frontier_new
        size += 1
    adj.unpersist()
    spark = graph.edges.sparkSession
    if not out_parts:
        return spark.createDataFrame([], "clique array<long>, size long")
    out = out_parts[0]
    for p in out_parts[1:]:
        out = out.unionByName(p)
    return out


def cliques(graph: Graph, min_size: int = 1,
            max_size: int | None = None,
            max_rounds: int = 1000) -> DataFrame:
    """igraph_cliques (/root/reference/src/cliques.c:327): ALL complete
    subgraphs with min_size <= size [<= max_size] ->
    DataFrame(clique array<long>, size).  Same degeneracy-oriented
    expansion as maximal_cliques, emitting every frontier row instead
    of only the witness-empty ones."""
    frontier, adj = _clique_frontier(graph)
    out_parts: list[DataFrame] = []
    size = 1
    while size <= (max_size or max_rounds):
        frontier = frontier.persist(StorageLevel.MEMORY_AND_DISK)
        if frontier.isEmpty():
            frontier.unpersist()
            break
        if size >= min_size:
            out_parts.append(
                frontier.select(F.sort_array("members").alias("clique"),
                                F.lit(size).cast("long").alias("size"))
                .localCheckpoint(eager=True))
        nxt = (frontier.where(F.size("cands") > 0)
               .select("members", "cands", F.explode("cands").alias("w")))
        frontier_new = (nxt.join(adj.withColumnRenamed(ID, "w"), "w")
                        .select(F.concat("members", F.array("w"))
                                .alias("members"),
                                F.array_intersect("cands", "fwd")
                                .alias("cands"),
                                F.lit(None).cast("array<long>")
                                .alias("ext")))
        frontier.unpersist()
        frontier = frontier_new
        size += 1
    adj.unpersist()
    spark = graph.edges.sparkSession
    if not out_parts:
        return spark.createDataFrame([], "clique array<long>, size long")
    out = out_parts[0]
    for p in out_parts[1:]:
        out = out.unionByName(p)
    return out


def clique_number(graph: Graph) -> int:
    """igraph_clique_number: the largest clique size."""
    row = maximal_cliques(graph).agg(F.max("size")).first()
    return int(row[0]) if row and row[0] is not None else 0
