"""Neighborhood-similarity joins (SURVEY.md §2.4):
cocitation / bibliographic coupling / Jaccard / Dice.

Reference: /root/reference/src/cocitation.c.  All are the same shape:
a self-join of the (directional) edge list on the shared endpoint,
then a grouped count per vertex pair, optionally normalized by
degrees.  Catalyst compiles these to shuffled hash joins + partial
aggregation; the pair blow-up is bounded by sum(deg^2) — hub-heavy
graphs should pre-cap or salt (the same skew note as triangles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from igraph_spark.graph import Graph, SRC, DST, ID


def cocitation(graph: Graph) -> DataFrame:
    """#common *in*-neighbors per vertex pair (igraph_cocitation) ->
    DataFrame(a, b, common) with a < b, pairs with common >= 1."""
    e = graph.edges.select(SRC, DST).distinct()
    x = e.select(F.col(SRC).alias("citer"), F.col(DST).alias("a"))
    y = e.select(F.col(SRC).alias("citer"), F.col(DST).alias("b"))
    # SHUFFLE_HASH: the wedge self-join streams O(wedges) rows; without
    # the hint it plans as sort-merge under autoBroadcastJoinThreshold=-1
    # and sorts both O(m) sides first (guide §3.1)
    return (x.join(y.hint("shuffle_hash"), "citer")
            .where(F.col("a") < F.col("b"))
            .groupBy("a", "b").agg(F.count("*").alias("common")))


def bibcoupling(graph: Graph) -> DataFrame:
    """#common *out*-neighbors per vertex pair (igraph_bibcoupling) ->
    DataFrame(a, b, common), a < b."""
    e = graph.edges.select(SRC, DST).distinct()
    x = e.select(F.col(DST).alias("cited"), F.col(SRC).alias("a"))
    y = e.select(F.col(DST).alias("cited"), F.col(SRC).alias("b"))
    return (x.join(y.hint("shuffle_hash"), "cited")
            .where(F.col("a") < F.col("b"))
            .groupBy("a", "b").agg(F.count("*").alias("common")))


def _neighbor_sets(graph: Graph, loops: bool = False) -> DataFrame:
    """(id, nbr) pairs in the ALL view, deduplicated."""
    sym = graph.sym_edges()
    if not loops:
        sym = sym.where(F.col(SRC) != F.col(DST))
    return sym.select(F.col(SRC).alias(ID), F.col(DST).alias("nbr")).distinct()


def similarity_jaccard(graph: Graph, min_common: int = 1) -> DataFrame:
    """Jaccard similarity of neighbor sets (igraph_similarity_jaccard)
    -> DataFrame(a, b, jaccard), a < b, only pairs sharing >=
    ``min_common`` neighbors (zero-similarity pairs are implicit, which
    keeps the output linear in the wedge count)."""
    ns = _neighbor_sets(graph)
    deg = ns.groupBy(ID).agg(F.count("*").alias("deg"))
    x = ns.select(F.col("nbr"), F.col(ID).alias("a"))
    y = ns.select(F.col("nbr"), F.col(ID).alias("b"))
    common = (x.join(y.hint("shuffle_hash"), "nbr")
              .where(F.col("a") < F.col("b"))
              .groupBy("a", "b").agg(F.count("*").alias("common"))
              .where(F.col("common") >= min_common))
    return (common
            .join(deg.select(F.col(ID).alias("a"), F.col("deg").alias("da")), "a")
            .join(deg.select(F.col(ID).alias("b"), F.col("deg").alias("db")), "b")
            .select("a", "b",
                    (F.col("common")
                     / (F.col("da") + F.col("db") - F.col("common")))
                    .alias("jaccard")))


def similarity_dice(graph: Graph, min_common: int = 1) -> DataFrame:
    """Dice similarity (igraph_similarity_dice) ->
    DataFrame(a, b, dice)."""
    ns = _neighbor_sets(graph)
    deg = ns.groupBy(ID).agg(F.count("*").alias("deg"))
    x = ns.select(F.col("nbr"), F.col(ID).alias("a"))
    y = ns.select(F.col("nbr"), F.col(ID).alias("b"))
    common = (x.join(y.hint("shuffle_hash"), "nbr")
              .where(F.col("a") < F.col("b"))
              .groupBy("a", "b").agg(F.count("*").alias("common"))
              .where(F.col("common") >= min_common))
    return (common
            .join(deg.select(F.col(ID).alias("a"), F.col("deg").alias("da")), "a")
            .join(deg.select(F.col(ID).alias("b"), F.col("deg").alias("db")), "b")
            .select("a", "b",
                    (2 * F.col("common") / (F.col("da") + F.col("db")))
                    .alias("dice")))


def similarity_inverse_log_weighted(graph: Graph) -> DataFrame:
    """Adamic/Adar-style inverse-log-weighted common neighbors
    (igraph_similarity_inverse_log_weighted) ->
    DataFrame(a, b, score): each common neighbor z contributes
    1/log(deg(z))."""
    ns = _neighbor_sets(graph)
    deg = ns.groupBy(ID).agg(F.count("*").alias("deg"))
    nw = ns.join(deg.select(F.col(ID).alias("nbr"), "deg"), "nbr") \
           .select(ID, "nbr", (1.0 / F.log("deg")).alias("w"))
    x = nw.select("nbr", F.col(ID).alias("a"), F.col("w"))
    y = nw.select("nbr", F.col(ID).alias("b"))
    return (x.join(y, "nbr").where(F.col("a") < F.col("b"))
            .groupBy("a", "b").agg(F.sum("w").alias("score")))
