"""Multilevel (Louvain-style) modularity community detection.

Reference: igraph_community_multilevel
(/root/reference/src/community.c:2893, level step :2655) — Blondel et
al. 2008: greedy local moving to the neighbor community with the best
modularity gain, then contraction of communities into supernodes,
repeated per level.

Spark shape: the local-moving sweep is semi-synchronous BSP (vertices
whose xxhash64 parity matches the round move; fully synchronous
moving oscillates on symmetric structures) — each round is

    tally   : edges ⋈ membership -> per (vertex, neighbor-community)
              weight sums (one join + agg)
    totals  : community total strengths (one agg, broadcast-joined)
    choose  : argmax_c [ w_vc - k_v * (tot_c - 1{c=own} k_v) / (2m) ]
              with deterministic (gain desc, community asc) tie-break

and contraction reuses ``contract_vertices`` + ``simplify`` (weights
summed, intra-community mass kept as supernode self-loops).  All moves
are deterministic for a given seed => reproducible at any parallelism.

The reference's own result depends on traversal order (RNG shuffles);
like its LPA test contract, parity is invariant-based: modularity of
the found partition (computed by igraph_spark.algorithms.lpa.modularity)
must reach reference-grade values on the fixture graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from igraph_spark.graph import Graph, SRC, DST, WEIGHT, ID


def _one_level(edges: DataFrame, m_total: float, seed: int,
               max_rounds: int, spark) -> tuple[DataFrame, int]:
    """Local-moving pass over an undirected weighted edge list
    (canonical u<=v, loops allowed as contracted self-mass).
    Returns (membership DataFrame(id, comm), n_moves_total)."""
    # symmetric incidence without self-loops (loops never drive a move:
    # they stay with the vertex in every community)
    nonloop = edges.where(F.col(SRC) != F.col(DST))
    inc = (nonloop.select(F.col(SRC).alias("v"), F.col(DST).alias("u"), WEIGHT)
           .unionByName(nonloop.select(F.col(DST).alias("v"),
                                       F.col(SRC).alias("u"), WEIGHT))
           .persist(StorageLevel.MEMORY_AND_DISK))
    loops = edges.where(F.col(SRC) == F.col(DST)) \
        .select(F.col(SRC).alias("v"), F.col(WEIGHT).alias("lw"))
    # strength includes loop mass twice (undirected loop convention)
    k = (inc.groupBy("v").agg(F.sum(WEIGHT).alias("k_nl"))
         .join(loops.groupBy("v").agg(F.sum("lw").alias("lw")), "v", "left")
         .select("v", (F.col("k_nl")
                       + 2 * F.coalesce("lw", F.lit(0.0))).alias("k")))
    verts = inc.select("v").distinct() \
        .unionByName(loops.select("v")).distinct()
    k = verts.join(k, "v", "left") \
        .select("v", F.coalesce("k", F.lit(0.0)).alias("k")) \
        .persist()

    # vertices with no non-loop neighbor can never move: split them out
    # once so each round's new state derives purely from the candidate
    # table (no state self-join — which also sidesteps analyzer trouble
    # with re-joining a checkpointed plan into its own derivation)
    active_ids = inc.select("v").distinct()
    static = (k.join(active_ids, "v", "left_anti")
              .select("v", F.col("v").alias("comm"), "k")
              .localCheckpoint(eager=True))
    state = (k.join(active_ids, "v", "left_semi")
             .select("v", F.col("v").alias("comm"), "k")
             .localCheckpoint(eager=True))
    static_tot = static.groupBy("comm").agg(F.sum("k").alias("tot"))

    total_moves = 0
    stable = 0
    for rnd in range(max_rounds):
        parity = rnd % 2
        # neighbor-community weights per vertex
        w_vc = (inc.join(state.select(F.col("v").alias("u"),
                                      F.col("comm").alias("c")), "u")
                .groupBy("v", "c").agg(F.sum(WEIGHT).alias("w_vc")))
        # the "stay where you are" option must always be a candidate —
        # without it a vertex whose own community holds none of its
        # neighbors (any singleton) would be forced into the best
        # neighbor community even at negative modularity gain
        stay = state.select("v", F.col("comm").alias("c"),
                            F.lit(0.0).alias("w_vc"))
        w_vc = (w_vc.unionByName(stay)
                .groupBy("v", "c").agg(F.max("w_vc").alias("w_vc")))
        tot = (state.groupBy("comm").agg(F.sum("k").alias("tot"))
               .unionByName(static_tot)
               .groupBy("comm").agg(F.sum("tot").alias("tot")))
        cand = (w_vc
                .join(F.broadcast(tot.withColumnRenamed("comm", "c")), "c")
                .join(state, "v"))
        own = (F.col("c") == F.col("comm")).cast("double")
        gain = (F.col("w_vc")
                - F.col("k") * (F.col("tot") - own * F.col("k"))
                / F.lit(2.0 * m_total))
        movable = (F.pmod(F.xxhash64("v", F.lit(seed)), F.lit(2)) == parity)
        # argmax via struct-max aggregation (gain desc, community asc)
        # instead of a per-round window sort; k and comm are constant
        # per vertex so max() is a safe carrier
        new = (cand.withColumn("g", gain)
               .groupBy("v")
               .agg(F.max(F.struct(F.col("g"),
                                   (-F.col("c")).alias("negc"))).alias("m"),
                    F.max("k").alias("k"),
                    F.max("comm").alias("prev"))
               .select("v",
                       F.when(movable, -F.col("m.negc"))
                        .otherwise(F.col("prev")).alias("comm"),
                       "k", "prev"))
        new = new.persist()
        moves = int(new.where(F.col("comm") != F.col("prev")).count())
        state = new.select("v", "comm", "k").localCheckpoint(eager=True)
        new.unpersist()
        total_moves += moves
        stable = stable + 1 if moves == 0 else 0
        if stable >= 2:
            break
    inc.unpersist()
    k.unpersist()
    out = state.select("v", "comm").unionByName(static.select("v", "comm"))
    return out, total_moves


def multilevel_communities(graph: Graph, max_levels: int = 10,
                           max_rounds_per_level: int = 30,
                           seed: int = 42) -> DataFrame:
    """Louvain-style communities -> DataFrame(id, label), labels
    densely renumbered by first appearance in vertex-id order (same
    output convention as label_propagation)."""
    spark = graph.edges.sparkSession
    und = graph if not graph.directed else graph.to_undirected("collapse")
    edges = (und.weighted_edges()
             .groupBy(SRC, DST).agg(F.sum(WEIGHT).alias(WEIGHT))
             .persist(StorageLevel.MEMORY_AND_DISK))
    m_total = edges.agg(F.sum(WEIGHT)).first()[0]
    if not m_total:
        # edgeless graph: every vertex is its own singleton community
        # (igraph gives isolated vertices singleton labels, not "none")
        # — ranked scale-safely (V singleton labels is the worst case
        # of exactly the funnel plans/ranking.py exists for)
        from igraph_spark.plans.ranking import dense_rank_map
        mapping, _ = dense_rank_map(graph.vertices.select(ID), ID, ID,
                                    "label")
        return mapping.select(ID, "label")

    # membership(id -> community) composed across levels
    membership = graph.vertices.select(ID, F.col(ID).alias("comm"))
    for _level in range(max_levels):
        level_mem, moves = _one_level(edges, float(m_total), seed,
                                      max_rounds_per_level, spark)
        if moves == 0:
            break
        # left join: isolated vertices (absent from the contracted edge
        # list, hence from level_mem) keep their current community as a
        # singleton instead of being silently dropped
        membership = (membership
                      .join(level_mem.withColumnRenamed("comm", "new_comm")
                            .withColumnRenamed("v", "comm"),
                            "comm", "left")
                      .select(ID, F.coalesce("new_comm", F.col("comm"))
                              .alias("comm"))
                      .localCheckpoint(eager=True))
        # contract: communities -> supernodes, weights summed,
        # intra-community mass becomes canonical self-loops
        contracted = (edges
                      .join(level_mem.withColumnRenamed("v", SRC)
                            .withColumnRenamed("comm", "cs"), SRC)
                      .join(level_mem.withColumnRenamed("v", DST)
                            .withColumnRenamed("comm", "cd"), DST)
                      .select(F.least("cs", "cd").alias(SRC),
                              F.greatest("cs", "cd").alias(DST), WEIGHT)
                      .groupBy(SRC, DST).agg(F.sum(WEIGHT).alias(WEIGHT))
                      .persist(StorageLevel.MEMORY_AND_DISK))
        n_before = edges.select(
            F.explode(F.array(SRC, DST))).distinct().count()
        n_after = contracted.select(
            F.explode(F.array(SRC, DST))).distinct().count()
        edges.unpersist()
        edges = contracted
        if n_after == n_before:
            break
    edges.unpersist()

    # dense relabel by first appearance in ascending vertex id —
    # scale-safe rank + conditional broadcast (plans/ranking.py)
    from igraph_spark.plans.ranking import dense_rank_map, rank_join
    firsts = membership.groupBy("comm").agg(F.min(ID).alias("first_id"))
    mapping, n = dense_rank_map(firsts, "comm", "first_id", "label")
    return rank_join(membership, mapping, n, "comm").select(ID, "label")
