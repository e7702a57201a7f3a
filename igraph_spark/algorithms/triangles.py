"""Triangle counting / transitivity via the degree-ordered wedge join.

Reference kernel: /root/reference/src/triangles_template.h:25-124 —
vertices ranked by degree, adjacency oriented toward strictly greater
rank (triangles.c:399-428), each triangle found once at its
minimum-rank corner.  Directions are always ignored and the graph is
implicitly simplified (loops + multi-edges dropped, triangles.c:552).

Spark mapping (SURVEY.md §2.0): the rank orientation becomes a struct
comparison ``(degree, id)`` — no global sort needed — and the kernel
becomes two chained equi hash joins:

    oriented(u→v)  iff (deg_u, u) < (deg_v, v)
    wedges  = oriented ⋈ oriented  on the shared low vertex
    closed  = wedges ⋈ oriented    on the (high1, high2) pair

The orientation bounds per-vertex wedge fan-out by O(sqrt(m)) — the
same hub-skew defense the reference gets from degree ordering; AQE
skew-join splitting handles the residue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from igraph_spark.graph import Graph, SRC, DST, ID


def _simple_undirected(graph: Graph) -> DataFrame:
    """Canonical simple undirected edge set (u < v), loops dropped —
    the implicit simplify of igraph_i_trans4_al_simplify
    (triangles.c:399-428)."""
    e = graph.edges.select(F.least(SRC, DST).alias("u"),
                           F.greatest(SRC, DST).alias("v"))
    return e.where(F.col("u") != F.col("v")).distinct()


def _oriented(graph: Graph) -> tuple[DataFrame, DataFrame]:
    """Returns (oriented edges with rank-key structs, simple degrees).

    oriented columns: lo, hi, klo, khi  where k* = struct(deg, id) and
    (deg_lo, lo) < (deg_hi, hi) — the reference's rank orientation
    (triangles_template.h:47-56) as a pure column comparison.
    """
    simple = _simple_undirected(graph)
    deg = (simple.select(F.col("u").alias(ID))
           .unionByName(simple.select(F.col("v").alias(ID)))
           .groupBy(ID).agg(F.count("*").alias("deg")))
    e = (simple
         .join(deg.select(F.col(ID).alias("u"), F.col("deg").alias("du"))
               .hint("shuffle_hash"), "u")
         .join(deg.select(F.col(ID).alias("v"), F.col("deg").alias("dv"))
               .hint("shuffle_hash"), "v"))
    ku = F.struct(F.col("du").alias("d"), F.col("u").alias("i"))
    kv = F.struct(F.col("dv").alias("d"), F.col("v").alias("i"))
    oriented = e.select(
        F.when(ku < kv, F.col("u")).otherwise(F.col("v")).alias("lo"),
        F.when(ku < kv, F.col("v")).otherwise(F.col("u")).alias("hi"),
        F.when(ku < kv, ku).otherwise(kv).alias("klo"),
        F.when(ku < kv, kv).otherwise(ku).alias("khi"))
    return oriented, deg


def _wedge_close(oriented: DataFrame) -> DataFrame:
    """The two chained equi joins over a (cached) oriented table ->
    DataFrame(a, b, c), a<b<c.

    Both joins carry SHUFFLE_HASH hints (guide §3.1): under
    autoBroadcastJoinThreshold=-1 the planner can only pick sort-merge,
    which SORTS the full O(wedges) stream before the closing probe;
    the hash join builds from the O(m) oriented side instead."""
    e1 = oriented.select(F.col("lo").alias("x"), F.col("hi").alias("y"),
                         F.col("khi").alias("ky"))
    e2 = oriented.select(F.col("lo").alias("x"), F.col("hi").alias("z"),
                         F.col("khi").alias("kz"))
    wedges = (e1.join(e2.hint("shuffle_hash"), "x")
              .where(F.col("ky") < F.col("kz"))
              .select("x", "y", "z"))
    closing = oriented.select(F.col("lo").alias("y"), F.col("hi").alias("z"))
    tri = wedges.join(closing.hint("shuffle_hash"), ["y", "z"])
    return tri.select(
        F.least("x", "y", "z").alias("a"),
        F.greatest(F.least("x", "y"), F.least(F.greatest("x", "y"), F.col("z"))).alias("b"),
        F.greatest("x", "y", "z").alias("c"))


def triangles_df(graph: Graph, _oriented_df: DataFrame | None = None
                 ) -> DataFrame:
    """All triangles, one row each -> DataFrame(a, b, c) with a<b<c
    (by vertex id).  Pass a pre-built (and pre-persisted) oriented table
    via ``_oriented_df`` to share it across computations; otherwise the
    lazy result recomputes orientation per action (callers that run a
    single action should use the cached helpers below)."""
    if _oriented_df is None:
        _oriented_df, _ = _oriented(graph)
    return _wedge_close(_oriented_df)


def triangle_count(graph: Graph) -> int:
    """Global triangle count (each triangle once)."""
    oriented, _ = _oriented(graph)
    oriented = oriented.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        return _wedge_close(oriented).count()
    finally:
        oriented.unpersist()


def adjacent_triangles(graph: Graph) -> DataFrame:
    """Per-vertex triangle count (igraph_adjacent_triangles,
    triangles.c:535-546) -> DataFrame(id, triangles); every corner of a
    triangle is credited (triangles_template.h:94-97)."""
    tri = triangles_df(graph)
    corners = (tri.select(F.explode(F.array("a", "b", "c")).alias(ID))
               .groupBy(ID).agg(F.count("*").alias("triangles")))
    return (graph.vertices.select(ID)
            .join(corners, ID, "left")
            .select(ID, F.coalesce("triangles", F.lit(0)).cast("long")
                    .alias("triangles")))


def transitivity_undirected(graph: Graph, mode: str = "nan") -> float:
    """Global transitivity = 3*triangles / #connected-triples
    (igraph_transitivity_undirected, triangles.c:617-699).
    mode 'nan'|'zero' controls the no-triples result (triangles.c:600-602).
    The oriented table is built once and shared by the triple count and
    the wedge-close join."""
    oriented, deg = _oriented(graph)
    oriented = oriented.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        triples = (deg.agg(F.sum(F.col("deg") * (F.col("deg") - 1) / 2))
                   .first()[0]) or 0
        if triples == 0:
            return float("nan") if mode == "nan" else 0.0
        tri = _wedge_close(oriented).count()
    finally:
        oriented.unpersist()
    return 3.0 * tri / float(triples)


def transitivity_local_undirected(graph: Graph, mode: str = "nan") -> DataFrame:
    """Local clustering coefficient
    (igraph_transitivity_local_undirected, triangles.c:430-505) ->
    DataFrame(id, transitivity).  deg<2 vertices get NaN (mode='nan')
    or 0 (mode='zero'), per triangles.c:471-473."""
    _, deg = _oriented(graph)
    t = adjacent_triangles(graph)
    joined = (t.join(deg, ID, "left")
              .withColumn("deg", F.coalesce("deg", F.lit(0))))
    pairs = (F.col("deg") * (F.col("deg") - 1) / 2.0)
    fallback = F.lit(float("nan")) if mode == "nan" else F.lit(0.0)
    return joined.select(
        ID,
        F.when(F.col("deg") >= 2, F.col("triangles") / pairs)
         .otherwise(fallback).alias("transitivity"))


def transitivity_barrat(graph: Graph, mode: str = "nan") -> DataFrame:
    """Weighted local transitivity (Barrat et al. 2004;
    igraph_transitivity_barrat, triangles.c:713-953) ->
    DataFrame(id, transitivity).

    C_w(i) = 1/(s_i*(k_i-1)) * sum over triangles at i of
             (w_ij + w_ih)/2,  on the simplified weighted graph
    (multi-edge weights collapsed by sum).
    """
    we = graph.weighted_edges()
    simple_w = (we.where(F.col(SRC) != F.col(DST))
                .select(F.least(SRC, DST).alias("u"),
                        F.greatest(SRC, DST).alias("v"), "weight")
                .groupBy("u", "v").agg(F.sum("weight").alias("w")))
    simple_w = simple_w.persist(StorageLevel.MEMORY_AND_DISK)
    deg = (simple_w.select(F.col("u").alias(ID), "w")
           .unionByName(simple_w.select(F.col("v").alias(ID), "w"))
           .groupBy(ID).agg(F.count("*").alias("k"), F.sum("w").alias("s")))
    tri = triangles_df(graph)

    def edge_w(c1, c2, alias):
        return simple_w.select(F.least(c1, c2).alias("u"),
                               F.greatest(c1, c2).alias("v"),
                               F.col("w").alias(alias))

    withw = (tri
             .join(simple_w.select(F.col("u").alias("a"), F.col("v").alias("b"),
                                   F.col("w").alias("wab")), ["a", "b"])
             .join(simple_w.select(F.col("u").alias("a"), F.col("v").alias("c"),
                                   F.col("w").alias("wac")), ["a", "c"])
             .join(simple_w.select(F.col("u").alias("b"), F.col("v").alias("c"),
                                   F.col("w").alias("wbc")), ["b", "c"]))
    corners = withw.select(
        F.col("a").alias(ID), ((F.col("wab") + F.col("wac")) / 2).alias("contrib")
    ).unionByName(withw.select(
        F.col("b").alias(ID), ((F.col("wab") + F.col("wbc")) / 2).alias("contrib"))
    ).unionByName(withw.select(
        F.col("c").alias(ID), ((F.col("wac") + F.col("wbc")) / 2).alias("contrib")))
    sums = corners.groupBy(ID).agg(F.sum("contrib").alias("num"))
    fallback = F.lit(float("nan")) if mode == "nan" else F.lit(0.0)
    out = (graph.vertices.select(ID)
           .join(deg, ID, "left").join(sums, ID, "left")
           .select(ID, F.when(
               (F.col("k") >= 2) & (F.col("s") > 0),
               F.coalesce("num", F.lit(0.0)) / (F.col("s") * (F.col("k") - 1)))
               .otherwise(fallback).alias("transitivity")))
    return out


def list_triangles(graph: Graph) -> DataFrame:
    """igraph_list_triangles (triangles.c:567-573) ->
    DataFrame(a, b, c), a<b<c, deterministic order by (a, b, c)."""
    return triangles_df(graph).orderBy("a", "b", "c")
