"""Weighted betweenness / closeness — distributed Dijkstra-Brandes.

Reference: igraph_betweenness with a weights vector
(/root/reference/src/centrality.c:1767-1900, Dijkstra-based Brandes)
and weighted igraph_closeness (centrality.c:2473).

Spark shape: where the reference runs one Dijkstra per source with an
indexed heap, ALL sources advance simultaneously over (source, vertex)
state and the priority queue is replaced by monotone DataFrame
fixpoints:

  1. distances  — multi-source Bellman-Ford: each round relaxes every
     edge for every source at once (one join + min-aggregate).  After
     k rounds dist = min weight over paths of <= k hops, so a pair
     settles at its MIN-hop geodesic length; the fixpoint is reached
     after h_min = max over pairs of that min-hop count.  Per-round
     state is one (s, id, dist) table, localCheckpointed so lineage
     stays flat.
  2. tight DAG  — edges on shortest paths: dist(u) + w == dist(v),
     built with two distance joins.  Every geodesic is a path in this
     DAG; its depth H = max hop count over ALL geodesics, which can
     EXCEED h_min when equal-weight geodesics with different hop
     counts exist (e.g. s-a-b-t all weight 1 plus a direct s-t edge
     of weight 3: h_min(t) = 1 but the DAG runs 3 deep).
  3. sigma      — path counts as a forward recurrence on the DAG:
     sigma_k(s,v) = [v=s] + sum_{(u,v) tight} sigma_{k-1}(s,u);
     monotone nondecreasing, exact at its own fixpoint, which it
     reaches after exactly H rounds — so sigma measures H.
  4. delta      — Brandes dependencies as a backward recurrence:
     delta_k(s,v) = sum_{(v,w) tight} sigma_v/sigma_w * (1+delta_{k-1}(s,w));
     exact after H rounds (H taken from the sigma phase, never from
     the distance phase, whose h_min is only a lower bound on H).

Convergence detection is integer-only (never float-sum equality — a
double sum is not order-deterministic across Spark partitionings, so
two mathematically-converged rounds could compare unequal forever):
the distance phase counts CHANGED ROWS per round (new pair reached, or
a strictly smaller dist — both exact comparisons of copied doubles)
and stops at the first zero-change round; the sigma phase counts rows
whose count changed (geodesic counts are integers carried in doubles —
sums of integers are exact and order-independent below 2^53) and stops
at the first zero-change round, which measures the DAG depth H; the
delta phase then runs for exactly H rounds with no per-round action.

Scale: exact mode is O(sources * V) state rows per round, the same
O(V*E) total work as the reference's exact loop; the sampled
Brandes-Pich estimator (shared guardrail with the unweighted
implementation, betweenness.AUTO_SAMPLE_VCOUNT) is the 100x-scale
default above 16384 vertices.

Simple-graph contract: parallel edges are collapsed to their minimum
weight (distances unchanged; igraph's sigma would count min-weight
parallel edges as distinct geodesics — run simplify first, same
contract as the unweighted Brandes here).  Weights must be positive,
as igraph requires for its Dijkstra.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from igraph_spark.graph import Graph, SRC, DST, ID

WEIGHT = "weight"


def _weighted_edges(graph: Graph, use_directed: bool,
                    weight_col: str = WEIGHT,
                    flip: bool = False) -> DataFrame:
    """Traversal edge table (src, dst, w), parallel edges collapsed to
    min weight; undirected graphs get both orientations.  ``flip``
    reverses every edge (for mode='in' closeness)."""
    if weight_col not in graph.edges.columns:
        raise ValueError(f"weighted centrality needs a '{weight_col}' "
                         "edge column")
    e = graph.edges.select(SRC, DST, F.col(weight_col).cast("double")
                           .alias("w"))
    if flip and use_directed:
        e = e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST), "w")
    if not use_directed:
        e = e.unionByName(e.select(F.col(DST).alias(SRC),
                                   F.col(SRC).alias(DST), "w"))
    e = (e.where(F.col(SRC) != F.col(DST))
         .groupBy(SRC, DST).agg(F.min("w").alias("w"))
         .persist(StorageLevel.MEMORY_AND_DISK))
    if e.where(F.col("w") <= 0).limit(1).count() > 0:
        e.unpersist()
        raise ValueError("weights must be positive (igraph Dijkstra "
                         "requirement, centrality.c:1767)")
    return e


def weighted_distances(e: DataFrame, src_df: DataFrame,
                       max_rounds: int = 1000
                       ) -> tuple[DataFrame, int]:
    """Multi-source Bellman-Ford fixpoint -> ((s, id, dist) for every
    reachable pair, depth).  ``e``: (src, dst, w) with positive w;
    ``src_df``: one column ``s``.

    Convergence is an integer changed-row count: a row changed when a
    new (s, id) pair was reached or its dist strictly decreased.  The
    previous dist rides through the min-aggregate as a tagged copy, so
    the comparison is between bit-identical doubles — exact and
    deterministic under any partitioning (unlike a sum-of-dists
    signature, whose accumulation order varies).  ``depth`` = number of
    rounds that changed anything = max over reachable pairs of the MIN
    hop count among that pair's geodesics.  NOTE this is only a LOWER
    bound on the tight DAG's depth (a pair with both a short-hop and a
    long-hop equal-weight geodesic settles early) — the sigma phase
    measures the true DAG depth itself; never bound sigma/delta by
    this value."""
    dist = (src_df.select("s", F.col("s").alias(ID),
                          F.lit(0.0).alias("dist"))
            .localCheckpoint(eager=True))
    depth = 0
    for _ in range(max_rounds):
        cand = (dist.join(e, dist[ID] == e[SRC])
                .select("s", F.col(DST).alias(ID),
                        (F.col("dist") + F.col("w")).alias("dist"),
                        F.lit(False).alias("is_old")))
        merged = (dist.select("s", ID, "dist", F.lit(True).alias("is_old"))
                  .unionByName(cand)
                  .groupBy("s", ID)
                  .agg(F.min("dist").alias("dist"),
                       F.min(F.when(F.col("is_old"), F.col("dist")))
                       .alias("old"))
                  .localCheckpoint(eager=True))
        changed = (merged.where(F.col("old").isNull()
                                | (F.col("dist") < F.col("old")))
                   .count())
        dist = merged.select("s", ID, "dist")
        if changed == 0:
            break
        depth += 1
    return dist, depth


def _tight_edges(e: DataFrame, dist: DataFrame) -> DataFrame:
    """Shortest-path DAG: (s, u, v) where dist(s,u) + w == dist(s,v).
    Exact for integral weights; floating weights rely on IEEE exactness
    of the identical additions both joins perform."""
    du = dist.select("s", F.col(ID).alias("u"), F.col("dist").alias("du"))
    dv = dist.select("s", F.col(ID).alias("v"), F.col("dist").alias("dv"))
    return (e.join(du, e[SRC] == du["u"])
            .join(dv, (e[DST] == dv["v"]) & (du["s"] == dv["s"]))
            .where(F.col("du") + F.col("w") == F.col("dv"))
            .select(du["s"].alias("s"), "u", "v"))


def _sigma_fixpoint(t: DataFrame, dist: DataFrame,
                    max_rounds: int = 1000) -> tuple[DataFrame, int]:
    """Geodesic counts on the tight DAG -> ((s, id, sigma) over the
    reachable pairs, DAG depth H).  sigma_k counts geodesics of <= k
    hops, so the recurrence is monotone nondecreasing and changes in
    round k iff some geodesic has exactly k hops; the first zero-change
    round therefore certifies exactness AND measures H = the DAG depth
    (which the distance phase's round count can UNDERSTATE when
    equal-weight geodesics of different hop counts tie — the bug a
    fixed-round version of this recurrence had).

    The change test is integer-exact: geodesic counts are integers
    carried in doubles, and sums of integers are order-independent and
    exact below 2^53, so ``sigma != old`` is deterministic under any
    partitioning — no float-sum signatures.  (Beyond 2^53 geodesics the
    counts saturate in double precision — the reference's own sigma is
    a C double with the identical limit, centrality.c:1767 — and a
    saturated count stops changing, so termination still holds.)"""
    base = dist.select("s", ID,
                       F.when(F.col(ID) == F.col("s"), F.lit(1.0))
                       .otherwise(F.lit(0.0)).alias("seed"))
    sigma = base.select("s", ID, F.col("seed").alias("sigma")) \
        .localCheckpoint(eager=True)
    depth = 0
    for _ in range(max_rounds):
        inc = (t.join(sigma.select("s", F.col(ID).alias("u"),
                                   "sigma"), ["s", "u"])
               .groupBy("s", F.col("v").alias(ID))
               .agg(F.sum("sigma").alias("inc")))
        merged = (base.join(inc, ["s", ID], "left")
                  .join(sigma.select("s", ID,
                                     F.col("sigma").alias("old")),
                        ["s", ID])
                  .select("s", ID,
                          (F.col("seed") + F.coalesce("inc", F.lit(0.0)))
                          .alias("sigma"),
                          "old")
                  .localCheckpoint(eager=True))
        changed = merged.where(F.col("sigma") != F.col("old")).count()
        sigma = merged.select("s", ID, "sigma")
        if changed == 0:
            break
        depth += 1
    return sigma, depth


def _delta_fixpoint(t: DataFrame, sigma: DataFrame,
                    rounds: int) -> DataFrame:
    """Brandes pair dependencies as a backward recurrence ->
    (s, id, delta).  t2 carries sigma at both endpoints so each round
    is one join with the previous delta + one aggregate.  delta_k is
    exact for every vertex whose deepest downstream DAG path is <= k,
    so ``rounds`` iterations make all of them exact when ``rounds`` is
    the DAG depth H **as measured by the sigma phase** (the distance
    phase's round count is only a lower bound on H) — no per-round
    action, no float-equality convergence test."""
    t2 = (t.join(sigma.select("s", F.col(ID).alias("u"),
                              F.col("sigma").alias("su")), ["s", "u"])
          .join(sigma.select("s", F.col(ID).alias("v"),
                             F.col("sigma").alias("sv")), ["s", "v"])
          .persist(StorageLevel.MEMORY_AND_DISK))
    base = sigma.select("s", ID)
    delta = base.select("s", ID, F.lit(0.0).alias("delta")) \
        .localCheckpoint(eager=True)
    for _ in range(rounds):
        nxt = (t2.join(delta.select("s", F.col(ID).alias("v"), "delta"),
                       ["s", "v"])
               .groupBy("s", F.col("u").alias(ID))
               .agg(F.sum(F.col("su") / F.col("sv")
                          * (F.lit(1.0) + F.col("delta"))).alias("d")))
        delta = (base.join(nxt, ["s", ID], "left")
                 .select("s", ID, F.coalesce("d", F.lit(0.0))
                         .alias("delta"))
                 .localCheckpoint(eager=True))
    t2.unpersist()
    return delta


def betweenness_weighted(graph: Graph, sources=None,
                         directed: bool | None = None,
                         weight_col: str = WEIGHT,
                         max_rounds: int = 1000,
                         auto_sample_threshold: int | None = None,
                         sample_size: int = 256,
                         seed: int = 42) -> DataFrame:
    """Weighted betweenness (igraph_betweenness with weights,
    centrality.c:1767-1900) -> DataFrame(id, betweenness).

    Same estimator guardrail as the unweighted ``betweenness``: with
    ``sources=None`` above ``auto_sample_threshold`` vertices, the
    Brandes-Pich sampled estimator runs (``sample_size`` hash-chosen
    sources, dependencies scaled by n/k).
    """
    from igraph_spark.algorithms.betweenness import (
        AUTO_SAMPLE_VCOUNT, sample_sources, _source_df)
    if auto_sample_threshold is None:
        auto_sample_threshold = AUTO_SAMPLE_VCOUNT
    use_directed = graph.directed if directed is None else directed
    scale_up = 1.0
    if sources is None:
        n = graph.vcount()
        if n > auto_sample_threshold:
            sources = sample_sources(graph, sample_size, seed)
            scale_up = n / float(sample_size)
    e = _weighted_edges(graph, use_directed, weight_col)
    dist, _ = weighted_distances(e, _source_df(graph, sources),
                                 max_rounds)
    t = _tight_edges(e, dist).persist(StorageLevel.MEMORY_AND_DISK)
    # sigma measures the tight DAG's true depth H; the distance
    # phase's round count is only h_min <= H and must not bound
    # sigma/delta (equal-weight geodesics with more hops run deeper)
    sigma, dag_depth = _sigma_fixpoint(t, dist, max_rounds)
    delta = _delta_fixpoint(t, sigma, dag_depth)
    t.unpersist()
    e.unpersist()
    scale = (0.5 if not use_directed else 1.0) * scale_up
    bc = (delta.where(F.col(ID) != F.col("s"))
          .groupBy(ID)
          .agg((F.sum("delta") * F.lit(scale)).alias("betweenness")))
    return (graph.vertices.select(ID)
            .join(bc, ID, "left")
            .select(ID, F.coalesce("betweenness", F.lit(0.0))
                    .alias("betweenness")))


def closeness_weighted(graph: Graph, mode: str = "out",
                       weight_col: str = WEIGHT,
                       max_rounds: int = 1000,
                       auto_sample_threshold: int | None = None,
                       sample_size: int = 256,
                       seed: int = 42) -> DataFrame:
    """Weighted closeness (igraph_closeness with weights,
    centrality.c:2473): n_reached / sum of weighted distances over
    reachable pairs -> DataFrame(id, closeness) — the same
    reached/total convention as the unweighted ``closeness``.

    Above ``auto_sample_threshold`` vertices the Eppstein-Wang pivot
    estimator runs instead (distances measured TO ``sample_size``
    pivots via one inverse multi-source pass)."""
    from igraph_spark.algorithms.betweenness import (
        AUTO_SAMPLE_VCOUNT, sample_sources)
    if auto_sample_threshold is None:
        auto_sample_threshold = AUTO_SAMPLE_VCOUNT
    use_directed = graph.directed and mode != "all"
    flip = mode == "in"
    if graph.vcount() > auto_sample_threshold:
        # pivot estimator: run FROM the pivots in the inverse direction
        e = _weighted_edges(graph, use_directed, weight_col,
                            flip=not flip)
        pivots = sample_sources(graph, sample_size, seed) \
            .select(F.col(ID).alias("s"))
        d, _ = weighted_distances(e, pivots, max_rounds)
        e.unpersist()
        agg = (d.where(F.col("dist") > 0)
               .groupBy(ID)
               .agg(F.sum("dist").alias("total"),
                    F.count("*").alias("reached")))
        return agg.select(ID, (F.col("reached") / F.col("total"))
                          .alias("closeness"))
    e = _weighted_edges(graph, use_directed, weight_col, flip=flip)
    src = graph.vertices.select(F.col(ID).alias("s"))
    d, _ = weighted_distances(e, src, max_rounds)
    e.unpersist()
    agg = (d.where(F.col("dist") > 0)
           .groupBy("s")
           .agg(F.sum("dist").alias("total"),
                F.count("*").alias("reached")))
    return agg.select(F.col("s").alias(ID),
                      (F.col("reached") / F.col("total"))
                      .alias("closeness"))
