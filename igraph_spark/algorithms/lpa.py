"""Label-propagation community detection + modularity.

Reference: igraph_community_label_propagation
(/root/reference/src/community.c:2127-2362), Raghavan-Albert-Kumara
2007 with weights, initial labels and fixed vertices.  The reference
sweeps *asynchronously* in shuffled vertex order with random
tie-breaks (community.c:2248,2301-2304) — intentionally
nondeterministic; its own test contract is invariant-based (≤4
communities on karate etc., SURVEY.md §5).

Spark-native design: **semi-synchronous** BSP sweeps — each round
updates only the vertices whose ``xxhash64(id, seed)`` parity matches
the round parity (breaking the bipartite oscillation of fully
synchronous LPA), tallies incident label weight with a join +
groupBy(dst, label), and picks the dominant label with a deterministic
tie-break (max weight, then min label).  Fully deterministic at any
parallelism for a given seed.

Output labels are renumbered densely in order of first appearance by
vertex id (community.c:2323-2342); never-labeled vertices keep -1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from igraph_spark.graph import Graph, SRC, DST, WEIGHT, ID
from igraph_spark.checkpointing import SuperstepRunner

# measured join-strategy knobs (round 6; see BENCH/r06/lpa_ab_*.json):
# LPA_SORT_INC caches the incidence halves SORTED by src and drops the
# shuffle_hash hints, reproducing pagerank's near-free sorted-SMJ
# chain; LPA_SHJ_HINT keeps the hash-join hints over unsorted caches.
LPA_SORT_INC = False
LPA_SHJ_HINT = True


def _labels_df(graph: Graph, initial) -> DataFrame:
    """(id, label) start state; None initial => every vertex its own
    label (community.c:2198-2202); labels < 0 mean 'unlabeled'."""
    spark = graph.edges.sparkSession
    verts = graph.vertices.select(ID)
    if initial is None:
        return verts.select(ID, F.col(ID).alias("label"))
    if isinstance(initial, dict):
        idf = spark.createDataFrame(
            [(int(k), int(v)) for k, v in initial.items()], "id long, label long")
    else:
        idf = initial.select(F.col(initial.columns[0]).cast("long").alias(ID),
                             F.col(initial.columns[1]).cast("long").alias("label"))
    return (verts.join(idf, ID, "left")
            .select(ID, F.when(F.col("label") >= 0, F.col("label")).alias("label")))


def label_propagation(graph: Graph, weights: bool | None = None,
                      initial=None, fixed=None, max_iter: int = 100,
                      seed: int = 42, parity: str = "hash",
                      kernel: str = "join") -> DataFrame:
    """-> DataFrame(id, label) with dense first-appearance labels,
    -1 for vertices that never received one.

    ``parity`` selects the semi-synchronous update-set rule: 'hash'
    (default) updates vertices whose xxhash64(id, seed) parity matches
    the round parity; 'id' uses plain ``id % 2`` — same oscillation
    break, but expressible in ANSI SQL, which lets the driver oracle
    replay the exact sweep sequence in DuckDB.

    ``kernel``: 'join' (default) tallies neighbor labels with a JVM
    join + groupBy; 'csr' runs the per-partition CSR block kernel
    (plans/csr.py) — the label gather is vectorized numpy over Arrow
    batches and each block pre-combines (dst, label) partials.
    Identical results (same tally, same tie-break).  Measured at 10M
    edges / local[32]: join 30 s, csr 83 s for 6 sweeps — the Arrow
    re-ship of the edge blocks per sweep dominates LPA's cheap
    per-edge compute, so 'join' stays the default (csr pays off only
    for compute-heavy kernels like weighted PageRank; see csr.py)."""
    spark = graph.edges.sparkSession
    use_w = graph.has_weights if weights is None else bool(weights)

    # incident tally view: undirected = ALL (both directions);
    # directed uses in-adjacency like the reference (community.c:2280-2298)
    if graph.directed:
        inc = graph.weighted_edges() if use_w else \
            graph.edges.select(SRC, DST).withColumn(WEIGHT, F.lit(1.0))
    else:
        inc = graph.sym_edges(weighted=use_w)
        if not use_w:
            inc = inc.withColumn(WEIGHT, F.lit(1.0))
    inc = inc.where(F.col(SRC) != F.col(DST))  # self-label feedback excluded
    # partition once on the per-sweep join key and reuse the layout every
    # round (otherwise each sweep re-exchanges the whole incidence table)
    num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    inc_half: list[DataFrame] = []
    if kernel == "csr":
        from igraph_spark.plans.csr import csr_label_tally, with_block_key
        inc = (with_block_key(inc.select(SRC, DST,
                                         F.col(WEIGHT).alias("w")),
                              SRC, num_partitions)
               .repartition(num_partitions, "pk")
               .persist(StorageLevel.MEMORY_AND_DISK))
    else:
        # parity-split incidence (round 6, guide §2.3 — shuffle fewer
        # bytes): a semi-synchronous sweep only ever CONSUMES tallies
        # for vertices whose parity matches the round, so edges whose
        # dst has the other parity contribute nothing that round.
        # Caching the incidence as two dst-parity halves and joining
        # only the matching half exactly halves the per-sweep join
        # output and both tally exchanges, with identical results.
        pick_dst = (F.pmod(F.col(DST), F.lit(2)) if parity == "id"
                    else F.pmod(F.xxhash64(DST, F.lit(seed)), F.lit(2)))

        # a directed graph whose edges already carry the requested
        # hash(src) layout (Graph.hash_partition marker) keeps it
        # through the projection + parity filter — caching the halves
        # needs no exchange at all (guide §2.4)
        pre_partitioned = (graph.directed and
                           getattr(graph, "_src_partitions", None)
                           == num_partitions)

        def _half(p):
            h = inc.where(pick_dst == p)
            if not pre_partitioned:
                h = h.repartition(num_partitions, SRC)
            if LPA_SORT_INC:
                h = h.sortWithinPartitions(SRC, DST)
            return h.persist(StorageLevel.MEMORY_AND_DISK)

        inc_half = [_half(p) for p in (0, 1)]

    labels0 = _labels_df(graph, initial)
    if fixed is None:
        state0 = labels0.withColumn("fixed", F.lit(False))
    elif isinstance(fixed, (set, list, tuple)):
        # tiny pinned sets (the reference's use case) stay literals
        ids = {int(x) for x in fixed}
        state0 = labels0.withColumn(
            "fixed", F.col(ID).isin(ids) if ids else F.lit(False))
    else:
        # DataFrame fixed set: scale-safe left-join flag, never collected
        fdf = (fixed.select(F.col(fixed.columns[0]).cast("long").alias(ID))
               .withColumn("_fx", F.lit(True)))
        state0 = (labels0.join(fdf, ID, "left")
                  .withColumn("fixed", F.coalesce("_fx", F.lit(False)))
                  .drop("_fx"))

    runner = SuperstepRunner(spark, checkpoint_every=8, fused_eval=True)
    state, start, _ = runner.start(state0, params={"algo": "lpa", "seed": seed})

    stable_rounds = 0
    for step in range(start, max_iter):
        round_parity = step % 2
        if kernel == "csr":
            tally = (csr_label_tally(state.select(ID, "label"), inc,
                                     num_partitions)
                     .withColumnRenamed("label", "nbr_label")
                     .withColumnRenamed("dst", DST))
        else:
            # SHUFFLE_HASH (default): avoid re-sorting the cached
            # incidence half every sweep (guide §3.1; see pagerank.py
            # for the opposite, measured sorted-SMJ choice)
            nbr = state.select(F.col(ID).alias(SRC),
                               F.col("label").alias("nbr_label"))
            if LPA_SHJ_HINT:
                nbr = nbr.hint("shuffle_hash")
            tally = (inc_half[round_parity]
                     .join(nbr, SRC)
                     .where(F.col("nbr_label").isNotNull())
                     .groupBy(DST, "nbr_label")
                     .agg(F.sum(WEIGHT).alias("w")))
        # dominant label with (weight desc, label asc) tie-break as a
        # struct-max aggregation — two hash aggs with map-side partials
        # instead of a per-round window sort over the tally
        best = (tally.groupBy(DST)
                .agg(F.max(F.struct(F.col("w"),
                                    (-F.col("nbr_label")).alias("negl")))
                     .alias("m"))
                .select(F.col(DST).alias(ID),
                        (-F.col("m.negl")).alias("best")))
        pick = (F.pmod(F.col(ID), F.lit(2)) if parity == "id"
                else F.pmod(F.xxhash64(ID, F.lit(seed)), F.lit(2)))
        updatable = ((~F.col("fixed"))
                     & (pick == round_parity)
                     & F.col("best").isNotNull())
        best_j = best.hint("shuffle_hash") if LPA_SHJ_HINT else best
        new = (state.select(ID, F.col("label").alias("prev"), "fixed")
               .join(best_j, ID, "left")
               .select(ID,
                       F.when(updatable, F.col("best")).otherwise(F.col("prev"))
                       .alias("label"),
                       "prev", "fixed"))
        # advance registers a LAZY checkpoint (fused_eval); the
        # changed-count right after is the round's one materializing job
        state = runner.advance(step, new, metrics={})
        changed = int(state.agg(F.sum(
            (~F.col("label").eqNullSafe(F.col("prev"))).cast("long")))
            .first()[0] or 0)
        runner.update_metrics(step, {"changed": changed})
        stable_rounds = stable_rounds + 1 if changed == 0 else 0
        if stable_rounds >= 2:  # fixpoint for both parities
            break
    if inc_half:
        for h in inc_half:
            h.unpersist()
    else:
        inc.unpersist()

    # dense relabel by first appearance in ascending vertex id
    # (community.c:2323-2342); unlabeled -> -1.  Scale-safe rank +
    # conditional broadcast (plans/ranking.py): #labels can be Θ(V)
    from igraph_spark.plans.ranking import dense_rank_map, rank_join
    firsts = (state.where(F.col("label").isNotNull())
              .groupBy("label").agg(F.min(ID).alias("first_id")))
    mapping, n = dense_rank_map(firsts, "label", "first_id", "new_label")
    out = (rank_join(state, mapping, n, "label", "left")
           .select(ID, F.coalesce("new_label", F.lit(-1)).alias("label")))
    return out


def modularity(graph: Graph, membership: DataFrame,
               weights: bool | None = None) -> float:
    """Newman modularity Q = sum_c (e_c/m - (K_c/2m)^2)
    (igraph_modularity, /root/reference/src/community.c:875-945).

    ``membership``: DataFrame(id, label).  Directions are ignored (the
    reference treats the graph as undirected for modularity).
    """
    use_w = graph.has_weights if weights is None else bool(weights)
    e = graph.weighted_edges() if use_w else \
        graph.edges.select(SRC, DST).withColumn(WEIGHT, F.lit(1.0))
    mem = membership.select(F.col(membership.columns[0]).alias(ID),
                            F.col(membership.columns[1]).alias("label"))
    j = (e.join(mem.select(F.col(ID).alias(SRC), F.col("label").alias("cs")), SRC)
         .join(mem.select(F.col(ID).alias(DST), F.col("label").alias("cd")), DST))
    m_total = e.agg(F.sum(WEIGHT)).first()[0]
    if not m_total:
        return float("nan")
    intra = (j.where(F.col("cs") == F.col("cd"))
             .groupBy("cs").agg(F.sum(WEIGHT).alias("e_c")))
    k_half = (j.select(F.col("cs").alias("c"), F.col(WEIGHT).alias("w"))
              .unionByName(j.select(F.col("cd").alias("c"), F.col(WEIGHT).alias("w")))
              .groupBy("c").agg(F.sum("w").alias("k_c")))
    parts = (k_half.join(intra.withColumnRenamed("cs", "c"), "c", "left")
             .select(F.coalesce("e_c", F.lit(0.0)).alias("e_c"), "k_c"))
    row = parts.agg(
        F.sum(F.col("e_c") / m_total
              - (F.col("k_c") / (2.0 * m_total)) ** 2).alias("q")).first()
    return float(row.q)
