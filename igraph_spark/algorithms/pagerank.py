"""PageRank via BSP power iteration over DataFrames.

Semantic parity target: the igraph matvec kernel
(/root/reference/src/centrality.c:913-1035) that all three reference
backends (power / ARPACK / PRPACK) apply, with its exact conventions:

  * dangling vertices (out-degree 0) contribute their **whole** mass to
    the teleport pool; non-dangling contribute ``p*(1-damping)``
    (centrality.c:926-939),
  * unweighted out-degree excludes self-loops while the adjacency
    retains them (centrality.c:1414-1417); weighted out-strength sums
    *all* incident edge weights including loops, with negative weights
    clamped to 0 (centrality.c:1447-1462),
  * undirected graphs use ALL mode — each edge carries mass both ways,
    a self-loop twice (centrality.c:1389),
  * the reset vector is validated non-negative / sum>0 and normalized
    to 1 (centrality.c:1397-1406),
  * empty graph or all-zero weights => every score is 1/n
    (centrality.c:1340-1377),
  * the converged vector is normalized by its sum (centrality.c:1494-1509).

Execution shape (SURVEY.md §2.0/§4): the stochastic link table
``nw = w/outdeg(src)`` is folded in **once** before the loop, so each
superstep is exactly one equi-join (state × links) + one hash
aggregation on ``dst`` — a single O(m) exchange with map-side partial
sums (PLANS.md §1).  The dangling/teleport mass and the normalization
total are folded in as **scalar literals refreshed by one fused
one-row aggregate per superstep** — that aggregate doubles as the
materializing action for the superstep's lazy localCheckpoint
(SuperstepRunner ``fused_eval``), so each superstep is exactly one
Spark job and the only data that ever crosses back to the driver is
that one row of scalars.  Lineage is truncated every superstep
(localCheckpoint / durable checkpoint manifest via SuperstepRunner) —
see checkpointing.py for why per-round truncation beats letting
supersteps chain lazily between periodic checkpoints.

Convergence: L-inf delta over a ``check_every``-step window < tol.
With damping d the window delta bounds the distance to the fixpoint by
~delta/(1-d); default tol 1e-10 leaves >3 orders of headroom for the
north-rule allclose(1e-6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from igraph_spark.graph import Graph, SRC, DST, WEIGHT, ID
from igraph_spark.checkpointing import SuperstepRunner


def _resolve_reset(graph: Graph, reset) -> DataFrame | None:
    """Normalize a reset spec (dict id->mass | DataFrame(id, reset)) to
    a DataFrame(id, reset) summing to 1 (centrality.c:1397-1406)."""
    if reset is None:
        return None
    spark = graph.edges.sparkSession
    if isinstance(reset, dict):
        rdf = spark.createDataFrame(
            [(int(k), float(v)) for k, v in reset.items()], "id long, reset double")
    else:
        rdf = reset.select(F.col(reset.columns[0]).cast("long").alias(ID),
                           F.col(reset.columns[1]).cast("double").alias("reset"))
    row = rdf.agg(F.min("reset").alias("mn"), F.sum("reset").alias("s")).first()
    if row.mn is not None and row.mn < 0:
        raise ValueError("reset vector must not contain negative elements")
    if not row.s or row.s == 0:
        raise ValueError("sum of reset vector must not be zero")
    return rdf.select(ID, (F.col("reset") / F.lit(float(row.s))).alias("reset"))


def personalized_pagerank(graph: Graph, damping: float = 0.85, reset=None,
                          weights: bool | None = None, tol: float = 1e-10,
                          max_iter: int = 300, check_every: int = 10,
                          num_partitions: int | None = None,
                          run_dir: str | None = None,
                          kernel: str = "join",
                          init: DataFrame | None = None) -> DataFrame:
    """Personalized PageRank -> DataFrame(id, pagerank).

    ``weights``: None = use the graph's weight column when present,
    False = ignore it, True = require it.

    ``kernel``: "join" (default — codegen'd JVM join + hash agg) or
    "csr" (per-partition CSR block matvec in numpy over Arrow,
    igraph_spark.plans.csr; same flows, different physical strategy).

    ``init``: optional warm-start scores (DataFrame with id +
    pagerank/pr), e.g. the previous result on an evolving graph —
    the fixpoint is init-independent (power iteration on a primitive
    operator with per-step rescaling), so this only changes how many
    supersteps convergence takes; vertices absent from ``init`` (new
    arrivals) start at 1/n.  No reference analog (PRPACK solves cold,
    prpack/prpack_solver.cpp); this is the engine's evolving-graph
    path, paired with streaming/incremental.py.
    """
    if kernel not in ("join", "csr"):
        raise ValueError(f"unknown kernel {kernel!r}")
    spark = graph.edges.sparkSession
    n = graph.vcount()
    if n == 0:
        raise ValueError("empty vertex set")
    uniform = F.lit(1.0 / n)

    use_w = graph.has_weights if weights is None else bool(weights)
    if use_w and not graph.has_weights:
        raise ValueError("weights=True but the graph has no weight column")

    reset_df = _resolve_reset(graph, reset)

    def _all_uniform() -> DataFrame:
        return graph.vertices.select(ID, uniform.alias("pagerank"))

    if graph.ecount() == 0:  # special case, centrality.c:1340-1349
        return _all_uniform()

    # traversal view: directed uses stored orientation; undirected is the
    # symmetrized ALL view (self-loop appears twice, Graph.sym_edges)
    if graph.directed:
        trav = graph.weighted_edges() if use_w else \
            graph.edges.select(SRC, DST).withColumn(WEIGHT, F.lit(1.0))
    else:
        trav = graph.sym_edges(weighted=use_w)
        if not use_w:
            trav = trav.withColumn(WEIGHT, F.lit(1.0))

    if use_w:
        zw = trav.agg(F.min(WEIGHT).alias("mn"), F.max(WEIGHT).alias("mx")).first()
        if zw.mn == 0 and zw.mx == 0:  # all-zero weights, centrality.c:1367-1377
            return _all_uniform()
        # out-strength sums every incident weight incl. loops, negatives
        # clamped to 0 (centrality.c:1447-1462); the raw weight still
        # multiplies the flow (the kernel reads the original vector)
        outdeg = (trav.groupBy(SRC)
                  .agg(F.sum(F.greatest(WEIGHT, F.lit(0.0))).alias("outdeg")))
    else:
        # unweighted out-degree with loops=0 (centrality.c:1414-1415)
        outdeg = (trav.where(F.col(SRC) != F.col(DST))
                  .groupBy(SRC).agg(F.count("*").cast("double").alias("outdeg")))

    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    # stochastic link table, partitioned once and reused every superstep.
    # Rows whose source has zero out-degree carry no usable mass (the
    # reference's tmp value is declared unused, centrality.c:926-928).
    links = (trav.join(outdeg, SRC)
             .where(F.col("outdeg") != 0)
             .select(F.col(DST), F.col(SRC),
                     (F.col(WEIGHT) / F.col("outdeg")).alias("nw")))
    if kernel == "csr":
        from igraph_spark.plans.csr import with_block_key, csr_contrib
        links = with_block_key(links, SRC, num_partitions) \
            .repartition(num_partitions, "pk")
    elif (graph.directed
          and getattr(graph, "_src_partitions", None) == num_partitions):
        # edges already hash(src)-partitioned at the requested count
        # (Graph.hash_partition) and every step from edges to links is
        # partitioning-preserving (projection, src-keyed aggregation,
        # src-keyed join, filter) — the explicit repartition would be
        # a redundant full O(m) exchange (guide §2.4)
        pass
    else:
        links = links.repartition(num_partitions, SRC)
    links = links.persist()

    # vertex info: dangling flag + reset mass
    vinfo = graph.vertices.select(ID).join(
        outdeg.withColumnRenamed(SRC, ID), ID, "left")
    vinfo = vinfo.withColumn(
        "dangling", F.coalesce(F.col("outdeg"), F.lit(0.0)) == 0.0).drop("outdeg")
    # uniform reset (the common case) stays a LITERAL in the superstep
    # expression — no reset column rides the state, which narrows the
    # per-superstep checkpoint copy; a personalized reset vector is a
    # real per-vertex column as before
    if reset_df is not None:
        vinfo = (vinfo.join(reset_df, ID, "left")
                 .withColumn("reset", F.coalesce("reset", F.lit(0.0))))
    vinfo = vinfo.repartition(num_partitions, ID).persist()
    vinfo.count()
    reset_col = F.col("reset") if reset_df is not None else uniform
    state_cols = ["dangling"] + (["reset"] if reset_df is not None else [])

    d, fact = float(damping), 1.0 - float(damping)
    mass = F.when(F.col("dangling"), F.col("pr")).otherwise(F.col("pr") * fact)

    runner = SuperstepRunner(spark, run_dir=run_dir,
                             checkpoint_every=min(check_every, 5),
                             fused_eval=True)
    # dangling flag (and personalized reset mass) ride IN the state
    # (narrow columns on the O(V) vector) so each superstep is one join
    # with the aggregated flows instead of two (vinfo join eliminated
    # from the hot loop — measured ~25% off the 10-superstep bench leg)
    if init is not None:
        icol = "pagerank" if "pagerank" in init.columns else "pr"
        prev = init.select(ID, F.col(icol).cast("double").alias("pr0"))
        state0 = (vinfo.join(prev, ID, "left")
                  .select(ID, F.coalesce("pr0", uniform).alias("pr"),
                          *state_cols))
    else:
        state0 = vinfo.select(ID, uniform.alias("pr"), *state_cols)
    # "state": 3 versions the (id, pr, dangling[, reset]) schema so a
    # durable manifest written by an older code version never matches
    # on resume (runner.start also column-validates as a backstop)
    state, start, _ = runner.start(
        state0, params={"algo": "pagerank", "damping": d, "tol": tol,
                        "weighted": use_w, "n": n, "state": 3,
                        "warm": init is not None})

    # jump-pool mass + total of the starting state (scalars to the
    # driver once per superstep — the only data that ever crosses back,
    # SURVEY §3.2).  ``total`` renormalizes each update: for ordinary
    # graphs it is 1.0 exactly, but igraph's loop convention (loops in
    # the adjacency, not in the unweighted out-degree) makes the raw
    # operator non-stochastic, so power iteration needs per-step
    # rescaling to converge (as any eigensolver does).
    row0 = (state.agg(F.sum(mass).alias("sumfrom"),
                      F.sum("pr").alias("total")).first())
    sumfrom, total = float(row0.sumfrom), float(row0.total)

    converged = False
    for step in range(start, max_iter):
        if kernel == "csr":
            contrib = csr_contrib(state.select(ID, "pr"), links,
                                  num_partitions)
        else:
            # join strategy note (round 6, measured): this join stays
            # SORT-MERGE deliberately.  The links cache is pre-sorted
            # by src (hash_partition sortWithinPartitions), and the
            # superstep's own SMJ output is sorted by id, so the state
            # side re-enters the next superstep already ordered — the
            # per-superstep sorts degenerate to near-free passes over
            # sorted runs.  A shuffle_hash hint here was measured 1.6x
            # SLOWER at the bench shape (29.2 s vs 17.9 s for the
            # 10-superstep leg): it discards the sorted chain and pays
            # a hash build + random-probe per superstep.  WCC/LPA hint
            # shuffle_hash instead because their cached tables are NOT
            # sorted (see components.py/lpa.py).
            contrib = (links.join(state.select(ID, "pr"),
                                  links[SRC] == F.col(ID))
                       .groupBy(DST)
                       .agg(F.sum(F.col("pr") * F.col("nw")).alias("flow")))
        # one join per superstep: the state row already carries the
        # dangling flag, reset mass, and old score.  The runner's
        # eager checkpoint is the superstep's one full execution; the
        # delta/scalars aggregate then reads the checkpointed RDD.
        new = (state.join(contrib, state[ID] == contrib[DST], "left")
               .select(state[ID], *state_cols,
                       F.col("pr").alias("pr_old"),
                       ((F.lit(d) * F.coalesce("flow", F.lit(0.0))
                         + F.lit(sumfrom) * reset_col)
                        / F.lit(total)).alias("pr")))
        state = runner.advance(step, new, metrics={})
        row = (state.agg(
            F.max(F.abs(F.col("pr") - F.col("pr_old"))).alias("delta"),
            F.sum(mass).alias("sumfrom"),
            F.sum("pr").alias("total")).first())
        delta, sumfrom, total = (float(row.delta), float(row.sumfrom),
                                 float(row.total))
        runner.update_metrics(step, {"delta": delta})
        if delta < tol:
            converged = True
            break

    # final normalization by the vector sum (centrality.c:1494-1509)
    total = state.agg(F.sum("pr")).first()[0]
    result = state.select(ID, (F.col("pr") / F.lit(float(total))).alias("pagerank"))
    runner.finish(result, completed=converged)
    links.unpersist()
    vinfo.unpersist()
    return result


def pagerank(graph: Graph, damping: float = 0.85, weights: bool | None = None,
             tol: float = 1e-10, max_iter: int = 300, check_every: int = 10,
             num_partitions: int | None = None,
             run_dir: str | None = None, kernel: str = "join",
             init: DataFrame | None = None) -> DataFrame:
    """Uniform-reset PageRank (igraph_pagerank, centrality.c:1116-1124)
    -> DataFrame(id, pagerank).  ``init`` warm-starts from previous
    scores (see personalized_pagerank)."""
    return personalized_pagerank(graph, damping=damping, reset=None,
                                 weights=weights, tol=tol, max_iter=max_iter,
                                 check_every=check_every,
                                 num_partitions=num_partitions,
                                 run_dir=run_dir, kernel=kernel, init=init)
