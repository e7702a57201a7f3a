"""Graph set operations — graphs as edge sets (SURVEY.md §2.8).

Reference: /root/reference/src/operators.c.  All are one-line
relational ops on the edge DataFrames; vertex sets merge by id.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from igraph_spark.graph import Graph, SRC, DST, ID


def _merged_vertices(g1: Graph, g2: Graph):
    return g1.vertices.select(ID).unionByName(g2.vertices.select(ID)).distinct()


def union(g1: Graph, g2: Graph) -> Graph:
    """igraph_union (operators.c:705): edge multiset union keeping
    multiplicities (the reference's sorted merge keeps every copy)."""
    e = g1.edges.select(SRC, DST).unionByName(g2.edges.select(SRC, DST))
    return Graph(e, _merged_vertices(g1, g2), g1.directed, _canonical=True)


def disjoint_union(g1: Graph, g2: Graph) -> Graph:
    """igraph_disjoint_union (operators.c:71): shift g2's ids past g1's
    max id, then concat."""
    row = g1.vertices.agg(F.max(ID)).first()
    offset = int(row[0]) + 1 if row[0] is not None else 0
    e2 = g2.edges.select((F.col(SRC) + offset).alias(SRC),
                         (F.col(DST) + offset).alias(DST))
    v2 = g2.vertices.select((F.col(ID) + offset).alias(ID))
    e = g1.edges.select(SRC, DST).unionByName(e2)
    v = g1.vertices.select(ID).unionByName(v2)
    return Graph(e, v, g1.directed, _canonical=True)


def intersection(g1: Graph, g2: Graph) -> Graph:
    """igraph_intersection (operators.c:418): edges present in both."""
    e = (g1.edges.select(SRC, DST).distinct()
         .intersect(g2.edges.select(SRC, DST).distinct()))
    return Graph(e, _merged_vertices(g1, g2), g1.directed, _canonical=True)


def difference(g1: Graph, g2: Graph) -> Graph:
    """igraph_difference (operators.c:922): edges of g1 not in g2."""
    e = (g1.edges.select(SRC, DST)
         .join(g2.edges.select(SRC, DST), [SRC, DST], "left_anti"))
    return Graph(e, g1.vertices, g1.directed, _canonical=True)


def complementer(g1: Graph, loops: bool = False) -> Graph:
    """igraph_complementer (operators.c:1058): non-edges.  O(n^2)
    candidate space — test scale, like the reference's dense scan."""
    v = g1.vertices.select(ID)
    a = v.withColumnRenamed(ID, SRC)
    b = v.withColumnRenamed(ID, DST)
    cand = a.crossJoin(b)
    if g1.directed:
        cand = cand if loops else cand.where(F.col(SRC) != F.col(DST))
    else:
        cand = cand.where(F.col(SRC) <= F.col(DST)) if loops else \
            cand.where(F.col(SRC) < F.col(DST))
    e = cand.join(g1.edges.select(SRC, DST).distinct(), [SRC, DST], "left_anti")
    return Graph(e, v, g1.directed, _canonical=True)


def compose(g1: Graph, g2: Graph) -> Graph:
    """igraph_compose (operators.c:1151): relational composition —
    edge (a, c) iff (a, b) in g1 and (b, c) in g2.  Literally one
    equi-join."""
    e = (g1.edges.select(F.col(SRC).alias("a"), F.col(DST).alias("b"))
         .join(g2.edges.select(F.col(SRC).alias("b"), F.col(DST).alias("c")), "b")
         .select(F.col("a").alias(SRC), F.col("c").alias(DST))
         .distinct())
    return Graph(e, _merged_vertices(g1, g2), g1.directed, _canonical=True)
