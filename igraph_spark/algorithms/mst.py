"""Minimum spanning tree / forest — igraph_minimum_spanning_tree
(/root/reference/src/structural_properties.c, Prim variant) rebuilt as
distributed Borůvka: every component picks its minimum incident cross
edge each round (one struct-min aggregation — map-side combinable),
chosen edges hook components together, labels close by pointer
jumping.  O(log V) rounds, each round one O(m) keyed shuffle — the
same BSP budget as a WCC superstep, so the operator holds at 10^9
edges where Prim's sequential heap cannot.

Determinism: ties break on (weight, src, dst), so the tree is unique
for distinct weights and reproducible at any parallelism otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from igraph_spark.graph import Graph, SRC, DST, WEIGHT, ID


def minimum_spanning_tree(graph: Graph, weights: bool | None = None,
                          max_rounds: int = 64) -> DataFrame:
    """-> DataFrame(src, dst, weight): the MST (minimum spanning
    forest on disconnected input).  Unweighted graphs get weight 1
    everywhere (any spanning forest, deterministic)."""
    use_w = graph.has_weights if weights is None else bool(weights)
    e = (graph.weighted_edges() if use_w
         else graph.edges.select(SRC, DST).withColumn(WEIGHT, F.lit(1.0)))
    e = (e.select(F.least(SRC, DST).alias(SRC),
                  F.greatest(SRC, DST).alias(DST), WEIGHT)
         .where(F.col(SRC) != F.col(DST))
         .groupBy(SRC, DST).agg(F.min(WEIGHT).alias(WEIGHT))
         .persist(StorageLevel.MEMORY_AND_DISK))
    spark = e.sparkSession

    comp = graph.vertices.select(ID, F.col(ID).alias("comp")) \
        .localCheckpoint(eager=True)
    chosen_parts: list[DataFrame] = []
    for _ in range(max_rounds):
        lab_s = comp.select(F.col(ID).alias(SRC), F.col("comp").alias("cs"))
        lab_d = comp.select(F.col(ID).alias(DST), F.col("comp").alias("cd"))
        cross = (e.join(lab_s, SRC).join(lab_d, DST)
                 .where(F.col("cs") != F.col("cd")).persist())
        if cross.isEmpty():
            cross.unpersist()
            break
        # per-component minimum incident cross edge (both directions)
        inc = (cross.select(F.col("cs").alias("c"),
                            F.struct(WEIGHT, SRC, DST, "cd").alias("pick"))
               .unionByName(cross.select(
                   F.col("cd").alias("c"),
                   F.struct(WEIGHT, SRC, DST,
                            F.col("cs").alias("cd")).alias("pick"))))
        best = (inc.groupBy("c").agg(F.min("pick").alias("p"))
                .select("c", F.col("p.src").alias(SRC),
                        F.col("p.dst").alias(DST),
                        F.col("p.weight").alias(WEIGHT),
                        F.col("p.cd").alias("partner")))
        chosen = (best.select(SRC, DST, WEIGHT).distinct()
                  .localCheckpoint(eager=True))
        chosen_parts.append(chosen)
        # hook: each component points to min(self, partner); close the
        # pseudo-forest by pointer jumping until labels stabilize
        # mutual-pair hooks collapse naturally: both endpoints point at
        # the smaller label, which points at itself
        hook = best.select("c", F.least("c", "partner").alias("p"))
        # eager per-jump truncation: the limit(1) probe would only
        # partially materialize a lazy checkpoint, and rotating
        # persists recompute (see checkpointing.py); O(log n) jumps
        ptr = hook.localCheckpoint(eager=True)
        while True:
            a = ptr.select(F.col("c").alias("ac"), F.col("p").alias("ap"))
            b = ptr.select(F.col("c").alias("bc"), F.col("p").alias("bp"))
            nxt = (a.join(b, a["ap"] == b["bc"], "left")
                   .select(F.col("ac").alias("c"),
                           F.least(F.coalesce("bp", F.col("ap")),
                                   F.col("ap")).alias("p"))
                   .localCheckpoint(eager=True))
            changed = (nxt.select(F.col("c").alias("nc"),
                                  F.col("p").alias("np"))
                       .join(ptr, F.col("nc") == F.col("c"))
                       .where(F.col("np") != F.col("p")).limit(1).count())
            ptr = nxt
            if changed == 0:
                break
        new_comp = (comp.join(ptr.withColumnRenamed("c", "comp"), "comp",
                              "left")
                    .select(ID, F.coalesce("p", F.col("comp"))
                            .alias("comp"))
                    .localCheckpoint(eager=True))
        cross.unpersist()
        comp = new_comp
    e.unpersist()
    if not chosen_parts:
        return spark.createDataFrame([], "src long, dst long, weight double")
    out = chosen_parts[0]
    for p in chosen_parts[1:]:
        out = out.unionByName(p)
    return out.distinct()


def is_forest(graph: Graph) -> bool:
    """igraph_is_forest analog: acyclic undirected graph — every
    component satisfies m_c = n_c - 1 (equivalently m = n - #comp on
    simple graphs; multi/loop edges fail via the raw edge count)."""
    from igraph_spark.algorithms.components import connected_components
    m = graph.edges.where(F.col(SRC) != F.col(DST)).count()
    loops = graph.edges.where(F.col(SRC) == F.col(DST)).count()
    if loops:
        return False
    n = graph.vcount()
    ncomp = (connected_components(graph, mode="weak")
             .select("component").distinct().count())
    return m == n - ncomp


def is_tree(graph: Graph) -> bool:
    """igraph_is_tree analog: connected forest."""
    from igraph_spark.algorithms.components import connected_components
    ncomp = (connected_components(graph, mode="weak")
             .select("component").distinct().count())
    return ncomp == 1 and is_forest(graph)


def laplacian(graph: Graph, normalized: bool = False) -> DataFrame:
    """igraph_laplacian (/root/reference/src/structural_properties.c)
    as a sparse COO table -> DataFrame(i, j, value): diag = degree,
    off-diag = -1 per (collapsed) edge; normalized: L_sym =
    I - D^-1/2 A D^-1/2."""
    sym = (graph.sym_edges() if not graph.directed
           else graph.edges.select(SRC, DST)) \
        .where(F.col(SRC) != F.col(DST)).distinct()
    deg = sym.groupBy(SRC).agg(F.count("*").alias("d"))
    diag = (graph.vertices
            .join(deg.withColumnRenamed(SRC, ID), ID, "left")
            .select(F.col(ID).alias("i"), F.col(ID).alias("j"),
                    F.coalesce("d", F.lit(0)).cast("double")
                    .alias("value")))
    if normalized:
        diag = diag.select("i", "j",
                           F.when(F.col("value") > 0, 1.0).otherwise(0.0)
                           .alias("value"))
        ds = deg.select(F.col(SRC).alias("i2"), F.col("d").alias("di"))
        dd = deg.select(F.col(SRC).alias("j2"), F.col("d").alias("dj"))
        off = (sym.select(F.col(SRC).alias("i"), F.col(DST).alias("j"))
               .join(ds, F.col("i") == F.col("i2"))
               .join(dd, F.col("j") == F.col("j2"))
               .select("i", "j", (-1.0 / F.sqrt(F.col("di") * F.col("dj")))
                       .alias("value")))
    else:
        off = sym.select(F.col(SRC).alias("i"), F.col(DST).alias("j"),
                         F.lit(-1.0).alias("value"))
    return diag.unionByName(off)
