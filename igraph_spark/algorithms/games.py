"""Microscopic update rules (evolutionary games on graphs) —
igraph_deterministic_optimal_imitation / igraph_moran_process
(/root/reference/src/microscopic_update.c:570,723).

``optimal_imitation`` is the reference's deterministic rule verbatim
(a vertex adopts the strategy of the best-quantity member of its
closed neighborhood), generalized to update any vertex subset in one
synchronous pass; the reference's random tie-break becomes
smallest-vertex-id (deterministic at any parallelism).

``moran_step`` is one death-birth Moran step with the reference's
distributions — reproducer chosen proportional to quantity over all
vertices, death chosen among the reproducer's neighbors proportional
to edge weight — drawn with deterministic hash randomness via
Efraimidis-Spirakis keys (argmax of u^(1/w), one aggregate, no
cumulative-sum window), the same seeded-coin convention as the SIR
module: the sampling DISTRIBUTION matches the reference, the PRNG
stream does not (documented deviation)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from igraph_spark.graph import Graph, ID, SRC, DST, WEIGHT


def _incidence(graph: Graph, mode: str) -> DataFrame:
    """(v, nbr, weight) by neighbor mode, loops dropped."""
    e = graph.weighted_edges().where(F.col(SRC) != F.col(DST))
    out = e.select(F.col(SRC).alias("v"), F.col(DST).alias("nbr"), WEIGHT)
    inn = e.select(F.col(DST).alias("v"), F.col(SRC).alias("nbr"), WEIGHT)
    if not graph.directed or mode == "all":
        return out.unionByName(inn)
    if mode == "out":
        return out
    if mode == "in":
        return inn
    raise ValueError("mode must be 'out', 'in' or 'all'")


def optimal_imitation(graph: Graph, quantities: DataFrame,
                      strategies: DataFrame, optimality: str = "max",
                      mode: str = "all",
                      vids: DataFrame | None = None) -> DataFrame:
    """-> DataFrame(id, strategy) after one deterministic optimal
    imitation pass: each updated vertex adopts the strategy of the
    max- (or min-) quantity vertex in its closed neighborhood, ties
    toward the smallest vertex id.  ``vids`` restricts the update to a
    vertex subset (the reference updates exactly one vid per call);
    None updates every vertex synchronously."""
    if optimality not in ("max", "min"):
        raise ValueError("optimality must be 'max' or 'min'")
    q = quantities.select(F.col(ID), F.col(quantities.columns[-1])
                          .cast("double").alias("q"))
    s = strategies.select(F.col(ID), F.col(strategies.columns[-1])
                          .alias("strategy"))
    inc = _incidence(graph, mode).select("v", "nbr")
    # closed neighborhood: self + neighbors
    cand = (inc.unionByName(
        q.select(F.col(ID).alias("v"), F.col(ID).alias("nbr")))
        .join(q.select(F.col(ID).alias("nbr"), "q"), "nbr")
        .join(s.select(F.col(ID).alias("nbr"), "strategy"), "nbr"))
    if vids is not None:
        cand = cand.join(vids.select(F.col(vids.columns[0]).alias("v")),
                         "v", "left_semi")
    if optimality == "max":
        pick = F.max(F.struct(F.col("q"), (-F.col("nbr")).alias("nid"),
                              F.col("strategy")))
    else:
        pick = F.min(F.struct(F.col("q"), F.col("nbr").alias("nid"),
                              F.col("strategy")))
    best = (cand.groupBy("v")
            .agg(pick.alias("b"))
            .select(F.col("v").alias(ID), F.col("b.strategy")
                    .alias("strategy")))
    if vids is None:
        return best
    keep = s.join(best.select(ID), ID, "left_anti")
    return keep.unionByName(best)


def moran_step(graph: Graph, quantities: DataFrame,
               strategies: DataFrame, mode: str = "all",
               seed: int = 42) -> tuple[DataFrame, DataFrame]:
    """One Moran death-birth step -> (quantities', strategies'): the
    reproducer a is drawn proportional to quantity over ALL vertices
    (Efraimidis-Spirakis key ln(u)/q, u = seeded hash uniform), the
    dying vertex b proportional to edge weight among a's mode-
    neighbors; b takes a's strategy and quantity (the reference's
    update, microscopic_update.c:829-860).  Quantities must be
    non-negative with a positive sum."""
    q = quantities.select(F.col(ID), F.col(quantities.columns[-1])
                          .cast("double").alias("q"))
    s = strategies.select(F.col(ID), F.col(strategies.columns[-1])
                          .alias("strategy"))
    agg = q.agg(F.min("q").alias("mn"), F.sum("q").alias("tot")).first()
    if agg["mn"] is not None and agg["mn"] < 0:
        raise ValueError("quantities must be non-negative")
    if not agg["tot"]:
        raise ValueError("quantities sum to zero — no eligible reproducer")
    inc = _incidence(graph, mode)
    # reproducer must have >= 1 mode-neighbor (reference constraint)
    eligible = q.join(inc.select(F.col("v").alias(ID)).distinct(), ID)
    u = (F.xxhash64(F.lit(seed), F.col(ID)).cast("double")
         / F.lit(2.0 ** 64) + F.lit(0.5))
    key = F.when(F.col("q") > 0, F.log(u) / F.col("q")) \
           .otherwise(F.lit(float("-inf")))
    arow = (eligible.select(ID, key.alias("k"))
            .agg(F.max(F.struct(F.col("k"), F.col(ID))).alias("b"))
            .first())
    if arow is None or arow["b"] is None:
        raise ValueError("no eligible reproducer (graph has no edge or "
                         "all quantities are zero)")
    a = int(arow["b"][ID])
    nbrs = inc.where(F.col("v") == a)
    ue = (F.xxhash64(F.lit(seed), F.lit(1), F.col("nbr"))
          .cast("double") / F.lit(2.0 ** 64) + F.lit(0.5))
    ekey = F.when(F.col(WEIGHT) > 0, F.log(ue) / F.col(WEIGHT)) \
            .otherwise(F.lit(float("-inf")))
    brow = (nbrs.select("nbr", ekey.alias("k"))
            .agg(F.max(F.struct(F.col("k"), F.col("nbr"))).alias("b"))
            .first())
    b = int(brow["b"]["nbr"])
    a_q = q.where(F.col(ID) == a).first()["q"]
    a_s = s.where(F.col(ID) == a).first()["strategy"]
    q2 = q.select(ID, F.when(F.col(ID) == b, F.lit(a_q))
                  .otherwise(F.col("q")).alias("q"))
    s2 = s.select(ID, F.when(F.col(ID) == b, F.lit(a_s))
                  .otherwise(F.col("strategy")).alias("strategy"))
    return q2, s2
