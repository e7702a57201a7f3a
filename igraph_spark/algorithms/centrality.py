"""Eigenvector-family centralities beyond PageRank (SURVEY.md §2.12):
eigenvector centrality and HITS hub/authority scores.

Reference: igraph_eigenvector_centrality
(/root/reference/src/centrality.c:157-543), igraph_hub_score /
igraph_authority_score (:840-886).  The reference solves with ARPACK;
the dominant eigenvector is the same fixpoint a power iteration
reaches, and a BSP superstep (join + agg per round, max-normalized
like the reference's output convention: max score = 1) is the
Spark-native solver — one more instance of the PageRank execution
shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from igraph_spark.graph import Graph, SRC, DST, WEIGHT, ID
from igraph_spark.checkpointing import SuperstepRunner


def _weighted_trav(graph: Graph, reverse: bool = False) -> DataFrame:
    e = graph.weighted_edges()
    if not graph.directed:
        rev = e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST), WEIGHT)
        e = e.unionByName(rev)
    elif reverse:
        e = e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST), WEIGHT)
    return e


def _power_iterate(graph: Graph, edges: DataFrame, tol: float,
                   max_iter: int, algo: str,
                   shift: float = 1.0) -> DataFrame:
    """x' = normalize_max((A + shift*I) x) to a fixpoint ->
    DataFrame(id, score).  The +shift*I term leaves the eigenvectors
    unchanged but breaks the +-lambda oscillation of bipartite graphs
    (a star under plain power iteration has period 2); the reference's
    ARPACK solver is immune, a power method needs the shift."""
    spark = graph.edges.sparkSession
    num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    links = (edges.select(F.col(DST), F.col(SRC), F.col(WEIGHT).alias("nw"))
             .repartition(num_partitions, SRC).persist())
    verts = graph.vertices.select(ID).persist()

    runner = SuperstepRunner(spark, checkpoint_every=5)
    state0 = verts.select(ID, F.lit(1.0).alias("x"))
    state, start, _ = runner.start(state0, params={"algo": algo, "tol": tol})
    scale = 1.0
    for step in range(start, max_iter):
        flow = (links.join(state.select(ID, "x"), links[SRC] == F.col(ID))
                .groupBy(DST).agg(F.sum(F.col("x") * F.col("nw")).alias("f")))
        new = (verts.join(flow, verts[ID] == flow[DST], "left")
               .join(state.select(ID, F.col("x").alias("x_old")), ID)
               .select(verts[ID],
                       ((F.coalesce("f", F.lit(0.0))
                         + F.lit(float(shift)) * F.col("x_old"))
                        / F.lit(scale)).alias("x"),
                       "x_old"))
        new = new.persist()
        row = new.agg(F.max(F.abs(F.col("x") - F.col("x_old"))).alias("delta"),
                      F.max(F.abs(F.col("x"))).alias("mx")).first()
        delta, mx = float(row.delta), float(row.mx)
        if mx == 0:  # no edges feed anything: all-zero fixpoint
            scale = 1.0
        else:
            scale = mx
        state = runner.advance(step, new, metrics={"delta": delta})
        if delta < tol:
            break
    # final max-normalization (reference convention: max score = 1)
    mx = state.agg(F.max(F.abs(F.col("x")))).first()[0]
    if not mx:
        mx = 1.0
    out = state.select(ID, (F.col("x") / F.lit(float(mx))).alias("score"))
    links.unpersist()
    verts.unpersist()
    return out


def eigenvector_centrality(graph: Graph, tol: float = 1e-9,
                           max_iter: int = 200) -> DataFrame:
    """-> DataFrame(id, eigenvector) with max score 1 (reference
    scaling, centrality.c:157).  Directed graphs use in-edges (the left
    eigenvector), undirected the symmetrized adjacency."""
    e = _weighted_trav(graph)
    out = _power_iterate(graph, e, tol, max_iter, "eigenvector")
    return out.withColumnRenamed("score", "eigenvector")


def hits(graph: Graph, tol: float = 1e-9, max_iter: int = 100
         ) -> DataFrame:
    """HITS -> DataFrame(id, hub, authority), each max-normalized to 1
    (igraph_hub_score/_authority_score, centrality.c:840-886).

    a' = A^T h, h' = A a — equivalently hub scores are the dominant
    eigenvector of A A^T; we alternate the two half-steps per round.
    """
    spark = graph.edges.sparkSession
    num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = graph.weighted_edges()
    if not graph.directed:
        rev = e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST), WEIGHT)
        e = e.unionByName(rev)
    # two persisted layouts — by src for the authority half-step and by
    # dst for the hub half-step — exactly as igraph keeps both CSR (oi/os)
    # and CSC (ii/is) index views (igraph_datatype.h:62-76); with a single
    # src layout the dst-keyed join re-exchanged the edge table every round
    e_src = e.repartition(num_partitions, SRC).persist()
    e_dst = e.repartition(num_partitions, DST).persist()
    verts = graph.vertices.select(ID).persist()

    runner = SuperstepRunner(spark, checkpoint_every=4)
    state0 = verts.select(ID, F.lit(1.0).alias("hub"))
    state, start, _ = runner.start(state0, params={"algo": "hits"})
    for step in range(start, max_iter):
        auth = (e_src.join(state.select(F.col(ID).alias(SRC), "hub"), SRC)
                .groupBy(DST).agg(F.sum(F.col("hub") * F.col(WEIGHT))
                                  .alias("a_raw")))
        hub = (e_dst.join(auth.select(F.col(DST), "a_raw"), DST)
               .groupBy(SRC).agg(F.sum(F.col("a_raw") * F.col(WEIGHT))
                                 .alias("h_raw")))
        new = (verts.join(hub, verts[ID] == hub[SRC], "left")
               .join(state.select(ID, F.col("hub").alias("h_old")), ID)
               .select(verts[ID], F.coalesce("h_raw", F.lit(0.0)).alias("hub"),
                       "h_old"))
        new = new.persist()
        row = new.agg(F.max(F.abs(F.col("hub"))).alias("mx")).first()
        mx = float(row.mx) or 1.0
        new_n = new.select(ID, (F.col("hub") / F.lit(mx)).alias("hub"),
                           "h_old").persist()
        delta = float(new_n.agg(
            F.max(F.abs(F.col("hub") - F.col("h_old")))).first()[0])
        new.unpersist()  # superseded by the normalized copy
        state = runner.advance(step, new_n, metrics={"delta": delta})
        if delta < tol:
            break
    hubs = state.select(ID, "hub")
    auth = (e_src.join(hubs.select(F.col(ID).alias(SRC), "hub"), SRC)
            .groupBy(DST).agg(F.sum(F.col("hub") * F.col(WEIGHT))
                              .alias("a_raw")))
    amx = auth.agg(F.max(F.abs("a_raw"))).first()[0] or 1.0
    out = (verts.join(hubs, ID, "left")
           .join(auth.select(F.col(DST).alias(ID),
                             (F.col("a_raw") / F.lit(float(amx)))
                             .alias("authority")), ID, "left")
           .select(ID, F.coalesce("hub", F.lit(0.0)).alias("hub"),
                   F.coalesce("authority", F.lit(0.0)).alias("authority")))
    e_src.unpersist()
    e_dst.unpersist()
    verts.unpersist()
    return out


def centralization(scores: DataFrame, theoretical_max: float,
                   normalized: bool = True) -> float:
    """igraph_centralization
    (/root/reference/src/centrality.c:2800-2817):
    n * max(score) - sum(score), optionally / theoretical_max.
    ``scores``: DataFrame whose LAST column is the score."""
    col = scores.columns[-1]
    row = scores.agg(F.count("*").alias("n"), F.max(col).alias("mx"),
                     F.sum(col).alias("s")).first()
    if not row.n:
        return float("nan")
    cent = row.n * float(row.mx) - float(row.s)
    return cent / theoretical_max if normalized else cent


def centralization_degree(graph: Graph, mode: str = "all",
                          loops: bool = False,
                          normalized: bool = True) -> float:
    """igraph_centralization_degree (centrality.c:2829-2884) with the
    reference's theoretical maxima (centrality.c:2929-2972)."""
    n = graph.vcount()
    if graph.directed:
        if mode in ("in", "out"):
            tmax = (n - 1) * ((n - 1) if not loops else n)
        else:
            tmax = 2 * (n - 1) * ((n - 2) if not loops else (n - 1))
    else:
        tmax = (n - 1) * ((n - 2) if not loops else n)
    return centralization(graph.degree(mode, loops=loops), float(tmax),
                          normalized)


def constraint(graph: Graph, weights: bool | None = None) -> DataFrame:
    """Burt's constraint (igraph_constraint,
    /root/reference/src/structural_properties.c:2538) ->
    DataFrame(id, constraint); isolated vertices get NaN.

    Proportional tie strength p_ij = (w_ij + w_ji) / deg_i with deg_i
    the loop-free ALL-mode strength (structural_properties.c constraint
    body: in- and out-incidences both contribute, loops excluded);
    c_i = sum_j (p_ij + sum_q p_iq * p_qj)^2.  Pure joins + aggs: one
    symmetrized pair table, one 2-hop self-join.
    """
    use_w = graph.has_weights if weights is None else bool(weights)
    e = graph.weighted_edges() if use_w else \
        graph.edges.select(SRC, DST).withColumn(WEIGHT, F.lit(1.0))
    e = e.where(F.col(SRC) != F.col(DST))
    msym = (e.select(F.col(SRC).alias("i"), F.col(DST).alias("j"), WEIGHT)
            .unionByName(e.select(F.col(DST).alias("i"),
                                  F.col(SRC).alias("j"), WEIGHT))
            .groupBy("i", "j").agg(F.sum(WEIGHT).alias("m")))
    deg = msym.groupBy("i").agg(F.sum("m").alias("deg"))
    p = (msym.join(deg, "i")
         .select("i", "j", (F.col("m") / F.col("deg")).alias("p")))
    ind = (p.select(F.col("i"), F.col("j").alias("q"), F.col("p").alias("piq"))
           .join(p.select(F.col("i").alias("q"), F.col("j"),
                          F.col("p").alias("pqj")), "q")
           .where(F.col("i") != F.col("j"))
           .groupBy("i", "j").agg(F.sum(F.col("piq") * F.col("pqj"))
                                  .alias("ind")))
    s = F.coalesce("p", F.lit(0.0)) + F.coalesce("ind", F.lit(0.0))
    terms = (p.join(ind, ["i", "j"], "full")
             .select("i", (s * s).alias("t")))  # s*s, not pow: bit-equal
                                                # across engines
    c = terms.groupBy("i").agg(F.sum("t").alias("constraint"))
    return (graph.vertices.select(ID)
            .join(c.withColumnRenamed("i", ID), ID, "left")
            .select(ID, F.coalesce("constraint", F.lit(float("nan")))
                    .alias("constraint")))


def dyad_census(graph: Graph) -> DataFrame:
    """igraph_dyad_census (reference /root/reference/src/motifs.c):
    counts of mutual / asymmetric / null dyads -> one row
    (mut, asym, null).  Pure aggregation over the simple directed edge
    set."""
    spark = graph.edges.sparkSession
    n = graph.vcount()
    e = (graph.edges.select(SRC, DST)
         .where(F.col(SRC) != F.col(DST)).distinct())
    pairs = e.select(F.least(SRC, DST).alias("a"),
                     F.greatest(SRC, DST).alias("b"))
    per_pair = pairs.groupBy("a", "b").agg(F.count("*").alias("c"))
    row = per_pair.agg(
        F.sum((F.col("c") == 2).cast("long")).alias("mut"),
        F.sum((F.col("c") == 1).cast("long")).alias("asym")).first()
    mut = int(row.mut or 0)
    asym = int(row.asym or 0)
    null = n * (n - 1) // 2 - mut - asym
    return spark.createDataFrame([(mut, asym, null)],
                                 "mut long, asym long, null long")


def centralization_betweenness(graph: Graph,
                               normalized: bool = True) -> float:
    """igraph_centralization_betweenness (centrality.c:3014; tmax
    :3082 — (n-1)^2(n-2) directed, halved undirected)."""
    from igraph_spark.algorithms.betweenness import betweenness
    n = graph.vcount()
    if graph.directed:
        tmax = float((n - 1) * (n - 1) * (n - 2))
    else:
        tmax = (n - 1) * (n - 1) * (n - 2) / 2.0
    scores = betweenness(graph).select("id", "betweenness")
    return centralization(scores, tmax, normalized)


def centralization_closeness(graph: Graph, mode: str = "out",
                             normalized: bool = True) -> float:
    """igraph_centralization_closeness (centrality.c:3141; tmax —
    (n-1)(n-2)/(2n-3) for mode 'all', (n-1)(1-1/n) otherwise)."""
    from igraph_spark.algorithms.paths import closeness
    n = graph.vcount()
    if not graph.directed:
        mode = "all"
    if mode != "all":
        tmax = (n - 1) * (1.0 - 1.0 / n)
    else:
        tmax = (n - 1) * (n - 2) / (2.0 * n - 3.0)
    scores = closeness(graph, mode=mode).select("id", "closeness")
    return centralization(scores, tmax, normalized)


def centralization_eigenvector(graph: Graph, scale: bool = True,
                               normalized: bool = True) -> float:
    """igraph_centralization_eigenvector_centrality (centrality.c;
    tmax — n-1 directed, n-2 undirected scaled, (n-2)/sqrt(2)
    unscaled).  Scores from the package's power iteration, scaled to
    max 1 when ``scale`` (the reference's default)."""
    import math
    n = graph.vcount()
    if graph.directed:
        tmax = float(n - 1)
    elif scale:
        tmax = float(n - 2)
    else:
        tmax = (n - 2.0) / math.sqrt(2.0)
    scores = eigenvector_centrality(graph)
    col = scores.columns[-1]
    if scale:
        mx = scores.agg(F.max(col)).first()[0] or 1.0
        scores = scores.select("id", (F.col(col) / F.lit(mx)).alias(col))
    else:
        # unit 2-norm scaling
        nrm = scores.agg(F.sqrt(F.sum(F.col(col) * F.col(col)))).first()[0] \
            or 1.0
        scores = scores.select("id", (F.col(col) / F.lit(nrm)).alias(col))
    return centralization(scores, tmax, normalized)
